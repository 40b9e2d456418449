"""Public dataflow operators of the engine."""
