from . import math, rng, records, sphere_map, spectrum  # noqa: F401
