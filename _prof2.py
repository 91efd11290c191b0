import re, sys, time
import numpy as np, jax, jax.numpy as jnp
from rspc_tpu.capture.synthetic import SyntheticSequence
from rspc_tpu.config import (EdgeConfig, ICPConfig, NDTConfig, PipelineConfig,
                             RefineConfig, VoxelConfig)
from rspc_tpu.ops.deproject import Intrinsics
from rspc_tpu.registration import schemes as S
from tools.profile_tpu import profile_op_table

seq = SyntheticSequence(n_frames=10, yaw_step=-0.08, intr=Intrinsics.simple(640, 480))
clouds = seq.clouds()
config = PipelineConfig(
    icp=ICPConfig(target_chunk=4096), ndt=NDTConfig(neighborhood=7),
    edge=EdgeConfig(max_edge_points=16384, edge_types=("rgb_canny",)),
    voxel=VoxelConfig(leaf_size=0.01, max_points=10240),
    refine=RefineConfig(enabled=True, leaf_size=0.04, max_points=10240, decimate=2,
        normal_purity=0.995, chain=False, anchor_to_first=True,
        anchor_stages=(
            ICPConfig(max_iterations=3, max_correspondence_distance=0.05,
                transformation_epsilon=1e-12, euclidean_fitness_epsilon=1e-12,
                mse_threshold_absolute=1e-16, variant="point_to_plane", huber_delta=0.003,
                compute_fitness=False, use_pallas=False, target_chunk=16384),
            ICPConfig(max_iterations=3, max_correspondence_distance=0.02,
                transformation_epsilon=1e-12, euclidean_fitness_epsilon=1e-12,
                mse_threshold_absolute=1e-16, variant="point_to_plane", huber_delta=0.001,
                compute_fitness=False, use_pallas=False, target_chunk=16384),
        )),
    coarse_guard_cap=0.1)
sch = S.NDTEdgeBasedRegistration(rads=-0.08, config=config)
stacked = S.OrganizedCloud(
    xyz=jnp.stack([c.xyz for c in clouds]),
    rgb=jnp.stack([c.rgb for c in clouds]),
    valid=jnp.stack([c.valid for c in clouds]))
guesses = sch._guesses(10)
cfg = config
def fused():
    return S._registration_fused(
        stacked, guesses, cfg.edge, True, cfg.ndt, cfg.icp, cfg.refine,
        cfg.voxel.leaf_size, cfg.voxel.max_points, cfg.coarse_guard_cap)
tbl = profile_op_table(fused)
rows = sorted(((k[2], v) for k, v in tbl.items() if 'XLA Ops' in k[1]),
              key=lambda kv: -kv[1])
tot = sum(v for _, v in rows)
print(f'total {tot:.1f}ms over {len(rows)} ops')
import collections
agg = collections.Counter(); cnt = collections.Counter()
for name, ms in rows:
    m = re.match(r'%?([a-zA-Z_\-]+)', name)
    kind = m.group(1) if m else name[:20]
    agg[kind] += ms; cnt[kind] += 1
for k, v in agg.most_common(14):
    print(f'{k:30s} {v:8.1f} ms x{cnt[k]}')
print('--- top 12 ops:')
for name, ms in rows[:12]:
    print(f'{ms:9.3f}  {name[:120]}')
