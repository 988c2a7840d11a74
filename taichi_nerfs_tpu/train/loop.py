"""Host-side training orchestrator.

Mirrors the reference's driver loop (``train.py:166-219``): density-grid
refresh every 16 steps with a 256-step warmup, per-step fused train step,
periodic telemetry (loss / psnr / rays / rm_s / vr_s).  TPU-specific duty:
adapt the static per-ray sample capacity ``S`` between power-of-two buckets
as the occupancy grid sparsifies — each bucket is its own cached XLA
executable; the marcher reports per-ray sample counts so the host can pick
the smallest bucket that does not truncate.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from ..config import Config
from ..models.occupancy import mark_invisible_cells
from .state import TrainState, create_train_state
from .step import Batch, density_grid_step, train_step

MIN_CAP = 32


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 1).bit_length()


def _bucket(x: int) -> int:
    """Round up to {2^k, 1.5*2^k}: finer than pow2 so the packed field eval
    wastes at most ~33% headroom instead of ~100%."""
    p = _next_pow2(x)
    if x <= (p // 4) * 3:
        return (p // 4) * 3
    return p


class Trainer:
    def __init__(
        self,
        cfg: Config,
        data: Batch,
        K: np.ndarray,
        img_wh,
        state: Optional[TrainState] = None,
        log_fn=print,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — trains data-parallel
        over its ``data`` axis (``--num_devices``, parallel/shard.py):
        the ray batch shards across chips, gradients pmean over ICI, and
        the occupancy refresh fans its probe cells out with a pmax
        reduction.  The sharded step reproduces the single-chip step's
        batch bitwise (tests/test_sharding.py pins the equivalence)."""
        self.cfg = cfg
        self.data = data
        self.log_fn = log_fn
        self.mesh = mesh
        self.state = state if state is not None else create_train_state(cfg)
        # one-time camera-visibility marking (reference: train.py:129-133)
        occupancy = jax.jit(
            mark_invisible_cells, static_argnames=("cfg", "img_wh")
        )(self.cfg.model, K, data.poses, tuple(img_wh))
        self.state = self.state._replace(occupancy=occupancy)
        if mesh is not None:
            from ..parallel.shard import shard_batch, shard_state

            assert cfg.train.batch_size % mesh.devices.size == 0, (
                f"batch_size {cfg.train.batch_size} not divisible by "
                f"the {mesh.devices.size}-device mesh"
            )
            self.state = shard_state(self.state, mesh)
            self.data = shard_batch(self.data, mesh)
        # Start SMALL and grow on sustained overflow (round-2 verdict: the
        # dense-warmup regime kept S=1024/pack=2M for 40+ steps at 11.7 s
        # each because `_adapt_sample_cap` could only shrink).  During the
        # 256-step warmup every ray crosses mostly-occupied cells, so
        # counts_max == S whatever S is; capping S at 256 there truncates
        # only the first ~2% of training (the reference's own slab caps at
        # 1024, train.py:57-58 + ray_march.py) and makes warmup steps
        # ~5-20x cheaper.  Growth needs 2 consecutive overflowing adapts
        # (32 steps) so the still-dense early grid doesn't balloon S.
        self.sample_cap = min(256, cfg.render.train_sample_cap)
        # pack sized to cover the measured warmup load (rm ~ 165
        # samples/ray at S=256 on synthetic scenes) without truncation.
        # hard 2M-sample ceiling: the encoder's (M*L, 8F) working set at 4M
        # packed samples exceeds 16 GB HBM alongside the optimizer state
        self.pack_cap = min(
            _bucket(cfg.train.batch_size * 192),
            cfg.train.batch_size * self.sample_cap,
            2 * 1024 * 1024,
        )
        self.step = 0
        self._pending_counts_max = None
        self._pending_rm_samples = None
        self._pack_shrink_votes = 0
        self._cap_grow_votes = 0
        # freeze_caps: pin (sample_cap, pack_cap) — no bucket recompiles
        # (used by bench.py to keep the measurement to one XLA program)
        self.freeze_caps = False
        # opt-in phase accounting (utils/profiling.py); adds a per-step
        # host readback to attribute device time to the right phase
        self.timer = None

    def _adapt_sample_cap(self):
        """Resize the marching/packing buckets from the last step's counts."""
        if self._pending_counts_max is None or self.freeze_caps:
            self._pending_counts_max = None
            self._pending_rm_samples = None
            return
        counts_max = int(self._pending_counts_max)
        rm_samples = int(self._pending_rm_samples)
        self._pending_counts_max = None
        self._pending_rm_samples = None
        max_cap = self.cfg.render.train_sample_cap
        if counts_max >= self.sample_cap and self.sample_cap < max_cap:
            # sustained overflow only, and never during the density-grid
            # warmup: the mostly-dense warmup grid overflows ANY S (its
            # occupancy, not the scene, sets counts_max), each grown
            # bucket is a fresh XLA compile, and the reference itself
            # truncates at its 1024 slab there (ray_march.py wrapper)
            in_warmup = self.step <= self.cfg.train.warmup_steps
            self._cap_grow_votes += 0 if in_warmup else 1
            if self._cap_grow_votes >= 2:
                self.sample_cap = min(self.sample_cap * 2, max_cap)
                self._cap_grow_votes = 0
        else:
            self._cap_grow_votes = 0
            proposed = max(_next_pow2(counts_max + 1), MIN_CAP)
            if proposed < self.sample_cap:
                self.sample_cap = proposed
        # packed eval pays off once the dense grid is mostly padding; 2x
        # headroom over the observed batch total, pow2-bucketed
        n_dense = self.cfg.train.batch_size * self.sample_cap
        proposed_pack = min(
            _bucket(max(int(1.25 * rm_samples), 1024)), 2 * 1024 * 1024
        )
        # only shrink through a persistently lower bucket (hysteresis keeps
        # recompiles rare); grow immediately on overflow
        if proposed_pack > (self.pack_cap or 0):
            self.pack_cap = proposed_pack
        elif proposed_pack < (self.pack_cap or n_dense):
            self._pack_shrink_votes += 1
            if self._pack_shrink_votes >= 4:
                self.pack_cap = proposed_pack
                self._pack_shrink_votes = 0
        else:
            self._pack_shrink_votes = 0
        if self.pack_cap is not None and self.pack_cap >= n_dense:
            self.pack_cap = None

    def _grid_step(self, warmup: bool):
        if self.mesh is not None:
            from ..parallel.shard import sharded_density_grid_step

            return sharded_density_grid_step(
                self.state, self.cfg, self.mesh, warmup
            )
        return density_grid_step(self.state, self.cfg, warmup)

    def _train_step(self):
        if self.mesh is not None:
            from ..parallel.shard import sharded_train_step

            return sharded_train_step(
                self.state, self.data, self.cfg, self.mesh,
                self.sample_cap, self.pack_cap,
            )
        return train_step(
            self.state, self.data, self.cfg, self.sample_cap, self.pack_cap
        )

    def run_step(self):
        cfg = self.cfg
        if self.step % cfg.train.update_interval == 0:
            warmup = self.step < cfg.train.warmup_steps
            if self.timer is not None:
                with self.timer.phase(
                    "grid_update",
                    sync=lambda: np.asarray(
                        self.state.occupancy.bitfield
                    )[0],
                ):
                    self.state = self._grid_step(warmup)
            else:
                self.state = self._grid_step(warmup)
            self._adapt_sample_cap()
        if self.timer is not None:
            with self.timer.phase("train_step"):
                self.state, metrics = self._train_step()
                float(metrics["loss"])  # host sync (tunnel-safe)
        else:
            self.state, metrics = self._train_step()
        self._pending_counts_max = metrics["counts_max"]
        self._pending_rm_samples = metrics["rm_samples"]
        self.step += 1
        return metrics

    def fit(self, max_steps: Optional[int] = None, log_every: int = 1000):
        max_steps = max_steps or self.cfg.train.max_steps
        tic = time.time()
        metrics = None
        n_rays = self.cfg.train.batch_size
        for _ in range(max_steps + 1):
            metrics = self.run_step()
            step = self.step - 1
            if step % log_every == 0:
                m = jax.device_get(metrics)
                self.log_fn(
                    f"elapsed_time={time.time() - tic:.2f}s | "
                    f"step={step} | psnr={float(m['psnr']):.2f} | "
                    f"loss={float(m['loss']):.6f} | "
                    f"rays={n_rays} | "
                    f"rm_s={float(m['rm_samples']) / n_rays:.1f} | "
                    f"vr_s={float(m['vr_samples']) / n_rays:.1f} | "
                    f"S={self.sample_cap}"
                )
                if self.timer is not None and step > 0:
                    self.log_fn(f"phases: {self.timer.summary(reset=True)}")
        return metrics
