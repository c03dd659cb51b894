"""avsep_tpu.parallel — device mesh, shardings, and distributed helpers.

The reference's only parallelism is single-process
``torch.nn.DataParallel`` over GPUs (reference ``main.py:661``, SURVEY.md
§2.3).  Here data parallelism is expressed the JAX way: one
``jax.sharding.Mesh`` over ICI with a ``data`` axis, parameters replicated,
batches sharded on dim 0, and XLA inserting the psum for loss/grad
reduction under jit.
"""

from avsep_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated, shard_batch, shard_tree)
