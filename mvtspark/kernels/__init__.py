"""Pure-numpy kernels. Zero Spark imports — unit-testable standalone."""
