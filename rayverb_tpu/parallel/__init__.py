from .sharded import make_mesh, render_fused_sharded, shard_rays
from .datagen import render_irs_batched, trim_batch
