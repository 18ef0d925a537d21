"""Multi-chip execution: sample-axis sharding over a device mesh."""

from .mesh import (  # noqa: F401
    make_mesh,
    merge_films,
    run_sharded,
    sharded_render_step,
)
