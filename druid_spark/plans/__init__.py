"""Plan-level features: aggregate projections (materialized rollup
routing), the engine's one custom optimizer feature (SURVEY §4.2)."""
