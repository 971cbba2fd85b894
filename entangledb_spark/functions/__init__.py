"""Expression semantics: dialect expression → Column translation."""
