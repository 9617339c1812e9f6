"""Matrix I/O: MatrixMarket, raw SBM binaries, npz caches, generators."""
