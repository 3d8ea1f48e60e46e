"""Query registry package — split from the single queries.py by family
(round 5); the public surface (REGISTRY + every query callable and SQL
string, including _helpers) is unchanged: ``from wtes_ray import queries``
and ``from wtes_ray.queries import X`` both keep working."""
from .registry import *  # noqa: F401,F403
