"""Device-mesh parallelism: sharding rules, collectives via pjit/XLA."""
