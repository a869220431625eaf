from .directions import random_directions, uniform_directions, sphere_point
