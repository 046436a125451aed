"""Standalone tool drivers mirroring the reference's executables
(/root/reference/src/makefile:1-15): testbed (see ../testbed.py), wbm
matching tool, spectral partitioner."""
