"""Multimodal (image/audio/video) columns as opaque binary + typed metadata."""
