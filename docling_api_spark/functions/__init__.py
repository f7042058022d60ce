"""Column-level helper functions (all JVM-side / codegen-friendly)."""
