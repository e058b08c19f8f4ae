"""Pure-JAX geometry and compute ops (statically shaped, jit/vmap-safe)."""
