"""Per-query-type compilers (processing/.../query/Query.java:62-72)."""
