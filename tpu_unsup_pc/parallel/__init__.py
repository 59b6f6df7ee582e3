from tpu_unsup_pc.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate, batch_sharding,
)
from tpu_unsup_pc.parallel.train_sharded import (  # noqa: F401
    make_sharded_train_step, make_sharded_eval_step,
    make_sharded_predict_step, init_sharded_state,
)
