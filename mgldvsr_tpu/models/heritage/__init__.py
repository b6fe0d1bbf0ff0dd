"""BasicSR-heritage architectures rebuilt TPU-native (SURVEY §2.12)."""
