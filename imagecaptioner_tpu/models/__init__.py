"""Model zoo (L2): ViT teacher, CNN-LSTM students (full/compact/enhanced)."""
