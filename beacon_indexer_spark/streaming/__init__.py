"""Streaming: realtime head-follow loop + Structured Streaming transform."""
