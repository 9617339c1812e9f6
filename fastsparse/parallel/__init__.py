"""Multi-host distribution: meshes, partitioning, halo exchange."""
