"""Multi-chip execution: sample-axis sharding over a device mesh."""

from .mesh import make_mesh, sharded_render_step, merge_films  # noqa: F401
