"""Training loops (L4): teacher, KD, optimized KD."""
