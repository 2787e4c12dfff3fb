"""CLI entry points mirroring the reference's launch surface (L4/L5)."""
