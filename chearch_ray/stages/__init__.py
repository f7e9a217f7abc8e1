"""Ray Data stage callables: batch transforms (stateless functions)
and actor-pool classes (stateful, setup in __init__)."""
