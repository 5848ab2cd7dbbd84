"""End-to-end CDC pipeline: source → envelope transforms → sharding →
routes (predicate + template render) → connector sinks, checkpointed."""
