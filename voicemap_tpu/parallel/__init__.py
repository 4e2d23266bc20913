from . import (  # noqa: F401
    data_parallel,
    halo_conv,
    mesh,
    distributed,
    pipeline_parallel,
    sharded_distance,
    tensor_parallel,
)
