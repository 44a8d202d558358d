"""Pure column-expression building blocks (JVM-side, codegen-friendly)."""
