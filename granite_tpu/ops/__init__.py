# Kernel library — the analogue of assets/shaders/ (SURVEY.md §2.9).
# Regular dense math is plain jnp (XLA fuses it); irregular/gather-heavy
# work gets Pallas kernels on TPU with jnp fallbacks for CPU tests.
