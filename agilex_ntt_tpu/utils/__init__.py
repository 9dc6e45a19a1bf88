"""Host-side utilities: CRT reconstruction, profiling/report tooling."""
