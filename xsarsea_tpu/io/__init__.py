"""I/O: LUT serialization and SAR product readers."""
