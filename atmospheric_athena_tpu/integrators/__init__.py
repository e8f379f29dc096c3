"""Time integrators (CTU/VL), dispatched on dimensionality like
integrate_init (reference: src/integrators/integrate.c:24-88)."""
