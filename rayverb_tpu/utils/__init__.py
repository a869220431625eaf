from .directions import random_directions, random_directions_jax, uniform_directions, sphere_point
