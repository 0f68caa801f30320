"""Structured Streaming operators (weather-mv streaming parity + the
watermark/session capabilities the reference lacks)."""
