"""Device op layer: uint32 modular arithmetic, negacyclic NTT, RNS/CRT,
sampling, and polynomial ring ops — jnp reference paths plus Pallas kernels
for the hot loops."""
