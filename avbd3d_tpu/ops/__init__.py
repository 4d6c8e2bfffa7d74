"""Constraint/collision op layer: broadphase, narrowphase, contact/joint/
spring row math.  Everything here is pure, masked, static-shape jnp code
designed to vmap/jit cleanly on TPU."""
