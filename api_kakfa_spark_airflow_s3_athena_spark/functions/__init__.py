"""Column-level function library: reference-parity transforms, text
analysis, and vector math. All JVM-side built-ins except where a pandas
UDF is genuinely required (128-bit hash rendering)."""
