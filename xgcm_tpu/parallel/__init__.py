from .face_sharded import (  # noqa: F401
    FaceAxisRoles,
    compile_face_plan,
    face_axis_roles,
    face_halo_pad_widths,
    sharded_face_cumsum,
    sharded_face_op,
)
from .halo import ring_halo_pad, sharded_cumsum, sharded_op  # noqa: F401
from .mesh import (  # noqa: F401
    init_distributed,
    make_mesh,
    make_multihost_mesh,
    partition_spec,
    replicate,
    shard_gridded,
)
from .sharded_grid import ShardedGrid  # noqa: F401
from .diagnostics import sharded_cgrid_diagnostics  # noqa: F401
from .sharded_ufunc import sharded_apply_as_grid_ufunc  # noqa: F401
from .apply_many import sharded_apply_many  # noqa: F401
