"""Structured Streaming extensions over the events table (SURVEY.md §7
Phase 5 — nothing in the reference streams; this is the engine's
stream-processing surface)."""
