"""Relational + pipeline operators (SURVEY §2 inventory and beyond-parity ops)."""
