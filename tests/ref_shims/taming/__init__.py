"""taming-transformers shim (import-time symbols only)."""
