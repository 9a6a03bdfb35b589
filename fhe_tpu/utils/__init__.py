"""Utilities: performance monitoring, profiling harness, serialization,
native C++ helper bindings."""
