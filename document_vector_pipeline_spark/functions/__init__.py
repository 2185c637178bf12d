"""Column-level expression builders (all JVM-side built-ins — zero Python
in the hot path, whole-stage-codegen friendly)."""
