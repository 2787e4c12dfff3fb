"""Host-side utilities (no device code)."""
