"""Structured Streaming surface (SURVEY.md §7.2 item 5).

The reference is batch-only (SURVEY.md §2.4); the batch window
operators in ``operators/events.py`` are written in streaming-ready
shapes, and this package supplies the actual ``readStream`` wiring.
"""
