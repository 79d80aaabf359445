"""Device-mesh parallelism (SURVEY.md §2.4): shard_map data parallelism +
multi-host runtime. Replaces the reference's multiprocessing.Pool."""
from .data_parallel import (
    make_dp_metaobs_step,
    make_dp_minibatch_svi_step,
    make_dp_streamed_svi_step,
    make_dp_vb_step,
    make_mesh,
    replicate,
    shard_batch,
    sharded_local_step,
)
from .multihost import global_data_mesh, host_local_batch_to_global, initialize_distributed
from .state_parallel import fit_large_k, make_ss_vb_step, shard_params_by_state
from .time_parallel import (
    fit_long_chain,
    make_time_mesh,
    make_ts_stream_vb_step,
    make_ts_vb_step,
    shard_chain,
    time_sharded_decode,
    time_sharded_local_step,
    time_sharded_stream_stats,
)
