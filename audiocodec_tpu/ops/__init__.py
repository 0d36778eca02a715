"""Low-level TPU ops: windows, diamond folding, DCT-IV, Pallas kernels."""
