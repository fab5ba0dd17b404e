"""Per-layer weight streaming: host RAM <-> HBM double buffering.

Counterpart of the reference's offload machinery — C++ LayerOffloadHelper
(src/Module.h:214-323: compute stream + load stream ping-pong prefetch) and
the Python CPUOffloadManager (nunchaku/models/utils.py:52-263). On TPU the
same effect falls out of JAX's async dispatch: block i executes on device
while ``jax.device_put`` of block i+1's weights is still in flight, so a
plain lookahead loop gives compute/transfer overlap without explicit
streams or events. HBM holds only ``lookahead + 1`` blocks of weights
(~2/57 of the model) plus activations — the "run a 12-20B model in a few
GB" capability (reference README.md:24,39).

Measured (tools/bench_offload.py, 2026-08-16): this sandbox reaches its
TPU through a network tunnel, so host<->HBM runs at ~20-140 MB/s — about
100-1000x below a co-located TPU VM's DMA. Streaming 941 MB of block
weights took 6.8 s/step against a 16 ms resident step: entirely
link-bound, not dispatch-bound, and not representative of production
(where ~10 GB/s moves the full int8 FLUX in ~1.2 s and the lookahead
overlap hides most of it behind the 0.45 s compute). Re-run the tool on a
real TPU VM for deployable numbers.
"""

from __future__ import annotations

import jax

from ..models.transformers.transformer_flux import slice_module


def _host_device():
    return jax.local_devices(backend="cpu")[0]


class BlockStreamer:
    """Streams stacked-block parameters from host memory block by block."""

    def __init__(self, stacked_module, n_layers: int, device=None, lookahead: int = 1):
        host = _host_device()
        self.n = n_layers
        self.lookahead = max(1, lookahead)
        self.device = device or jax.devices()[0]
        # one host-resident pytree per layer (contiguous per-layer transfer)
        self.host_blocks = [
            jax.device_put(slice_module(stacked_module, i), host)
            for i in range(n_layers)
        ]

    def run(self, fn, carry, *args, start: int = 0):
        """carry = fn(block, carry, *args) over layers [start, n), prefetching."""
        inflight = {
            i: jax.device_put(self.host_blocks[i], self.device)
            for i in range(start, min(start + self.lookahead, self.n))
        }
        for i in range(start, self.n):
            block = inflight.pop(i)
            nxt = i + self.lookahead
            if nxt < self.n:  # async: overlaps with this block's compute
                inflight[nxt] = jax.device_put(self.host_blocks[nxt], self.device)
            carry = fn(block, carry, *args)
        return carry


class OffloadedFluxForward:
    """Offloaded forward for FluxTransformer2DModel.

    The embedding/head params stay on device (tiny); both block stacks
    stream from host. Usage::

        off = OffloadedFluxForward(model)   # moves block weights to host
        velocity = off(lat, txt, pooled, t, img_ids, txt_ids, guidance)
    """

    def __init__(self, model, lookahead: int = 1):
        self.model = model
        cfg = model.cfg
        self.dual = BlockStreamer(model.transformer_blocks, cfg.num_layers,
                                  lookahead=lookahead)
        self.single = BlockStreamer(model.single_transformer_blocks,
                                    cfg.num_single_layers, lookahead=lookahead)
        # free the device copies of the big stacks
        self.model = jax.tree_util.tree_map(lambda x: x, model)
        self.model.transformer_blocks = None
        self.model.single_transformer_blocks = None
        self.model.refresh_pytree()

        self._dual_fn = jax.jit(lambda blk, c, temb, rot: blk(c[0], c[1], temb, rot))
        self._single_fn = jax.jit(lambda blk, c, temb, rot: blk(c, temb, rot))
        self._embed = jax.jit(lambda m, *a: m.embed(*a))
        self._head = jax.jit(lambda m, img, temb: m.head(img, temb))

    def __call__(self, hidden_states, encoder_hidden_states, pooled_projections,
                 timestep, img_ids, txt_ids, guidance=None):
        import jax.numpy as jnp

        m = self.model
        img, txt, temb, rot = self._embed(
            m, hidden_states, encoder_hidden_states, pooled_projections,
            timestep, img_ids, txt_ids, guidance,
        )
        img, txt = self.dual.run(self._dual_fn, (img, txt), temb, rot)
        s_txt = txt.shape[1]
        x = jnp.concatenate([txt, img], axis=1)
        x = self.single.run(self._single_fn, x, temb, rot)
        return self._head(m, x[:, s_txt:], temb)


class OffloadedCachedFluxForward:
    """First-block cache composed with CPU offloading (the reference's
    examples/flux.1-dev-double_cache_offloading.py capability: cache +
    ``set_offload`` together).

    Dual block 0 — the cache's decision block — stays device-resident; the
    other 18 dual + 38 single blocks stream from host RAM. On a cache hit
    the cached residuals replay and NONE of those 56 blocks stream, so a
    hit saves the weight transfer (the offload bottleneck), not just the
    compute: with FLUX int8 that is ~6.2 GB of host->HBM traffic per hit.
    The decision is taken on host (this loop is un-jitted by construction —
    the streamer issues per-block device calls), mirroring the reference's
    graph break at the decision point (caching/utils.py:462).
    """

    def __init__(self, model, lookahead: int = 1,
                 residual_diff_threshold: float = 0.12):
        import jax.numpy as jnp

        self.threshold = residual_diff_threshold
        cfg = model.cfg
        # decision block stays resident (1/19 of the dual stack)
        self.block0 = jax.device_put(
            slice_module(model.transformer_blocks, 0), jax.devices()[0]
        )
        self.dual = BlockStreamer(model.transformer_blocks, cfg.num_layers,
                                  lookahead=lookahead)
        self.single = BlockStreamer(model.single_transformer_blocks,
                                    cfg.num_single_layers, lookahead=lookahead)
        self.model = jax.tree_util.tree_map(lambda x: x, model)
        self.model.transformer_blocks = None
        self.model.single_transformer_blocks = None
        self.model.refresh_pytree()

        self._dual_fn = jax.jit(lambda blk, c, temb, rot: blk(c[0], c[1], temb, rot))
        self._single_fn = jax.jit(lambda blk, c, temb, rot: blk(c, temb, rot))
        self._embed = jax.jit(lambda m, *a: m.embed(*a))
        self._head = jax.jit(lambda m, img, temb: m.head(img, temb))
        self._rel = jax.jit(
            lambda a, b: jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
            / (jnp.mean(jnp.abs(b.astype(jnp.float32))) + 1e-8)
        )
        self._prev_first = None  # bf16 (B, S_img, D)
        self._cached = None  # (dual_img, dual_txt, single) residuals
        self.hits = 0
        self.steps = 0

    def __call__(self, hidden_states, encoder_hidden_states, pooled_projections,
                 timestep, img_ids, txt_ids, guidance=None):
        import jax.numpy as jnp

        m = self.model
        img0, txt0, temb, rot = self._embed(
            m, hidden_states, encoder_hidden_states, pooled_projections,
            timestep, img_ids, txt_ids, guidance,
        )
        s_txt = txt0.shape[1]
        img1, txt1 = self._dual_fn(self.block0, (img0, txt0), temb, rot)
        first_res = (img1 - img0).astype(jnp.bfloat16)

        hit = (
            self._prev_first is not None
            and float(self._rel(first_res, self._prev_first)) < self.threshold
        )
        self.steps += 1
        if hit:
            self.hits += 1
            d_img, d_txt, d_single = self._cached
            img_f = img1 + d_img
            txt_f = txt1 + d_txt
            x_f = jnp.concatenate([txt_f, img_f], axis=1) + d_single
        else:
            img_f, txt_f = self.dual.run(
                self._dual_fn, (img1, txt1), temb, rot, start=1
            )
            x1 = jnp.concatenate([txt_f, img_f], axis=1)
            x_f = self.single.run(self._single_fn, x1, temb, rot)
            self._cached = (
                (img_f - img1).astype(jnp.bfloat16),
                (txt_f - txt1).astype(jnp.bfloat16),
                (x_f - x1).astype(jnp.bfloat16),
            )
            # store-on-miss (reference caching/fbcache.py:467-469 sets the
            # buffer only in the miss branch): hits keep comparing against
            # the last miss's residual, bounding sub-threshold drift streaks
            self._prev_first = first_res
        return self._head(m, x_f[:, s_txt:], temb)


class OffloadedCachedQwenImageForward:
    """Qwen-Image first-block cache composed with CPU offloading — the
    reference's flagship offload target (20B through 3-4 GB of VRAM,
    transformer_qwenimage.py:415-451 / README.md:24) with its DBCache
    example config on top (Fn_compute_blocks=8, qwen-image-cache-dit.py:25).

    The first ``fn_blocks`` indicator blocks stay device-resident; the
    remaining ``L - fn`` of the 60-block joint stack stream from host RAM.
    On a cache hit the cached img-stream residual replays and none of the
    streamed blocks transfer — with the 20B Qwen at int8 that is ~17 GB of
    host->HBM traffic saved per hit. Decision on host (this loop is
    un-jitted by construction), store-on-miss semantics identical to the
    jitted ``qwenimage_fb_cached_forward``."""

    def __init__(self, model, lookahead: int = 1,
                 residual_diff_threshold: float = 0.12, fn_blocks: int = 8):
        import jax.numpy as jnp

        cfg = model.cfg
        self.threshold = residual_diff_threshold
        self.fn = max(1, min(int(fn_blocks), cfg.num_layers - 1))
        dev = jax.devices()[0]
        # indicator blocks resident (fn/L of the stack)
        self.head_blocks = [
            jax.device_put(slice_module(model.blocks, i), dev)
            for i in range(self.fn)
        ]
        self.blocks = BlockStreamer(model.blocks, cfg.num_layers,
                                    lookahead=lookahead)
        self.model = jax.tree_util.tree_map(lambda x: x, model)
        self.model.blocks = None
        self.model.refresh_pytree()

        self._block_fn = jax.jit(
            lambda blk, c, temb, rot: blk(c[0], c[1], temb, rot)
        )
        self._embed = jax.jit(lambda m, *a: m.embed(*a))
        self._head = jax.jit(lambda m, img, temb: m.head(img, temb))
        self._rel = jax.jit(
            lambda a, b: jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
            / (jnp.mean(jnp.abs(b.astype(jnp.float32))) + 1e-8)
        )
        self._prev_first = None  # bf16 (B, S_img, D) img residual after fn
        self._cached = None  # bf16 img residual of blocks fn..L-1
        self.hits = 0
        self.steps = 0

    def __call__(self, hidden_states, encoder_hidden_states, timestep,
                 img_ids, txt_ids=None):
        import jax.numpy as jnp

        m = self.model
        img0, txt0, temb, rot = self._embed(
            m, hidden_states, encoder_hidden_states, timestep, img_ids,
            txt_ids,
        )
        img, txt = img0, txt0
        for blk in self.head_blocks:
            img, txt = self._block_fn(blk, (img, txt), temb, rot)
        first_res = (img - img0).astype(jnp.bfloat16)

        hit = (
            self._prev_first is not None
            and float(self._rel(first_res, self._prev_first)) < self.threshold
        )
        self.steps += 1
        if hit:
            self.hits += 1
            img_f = img + self._cached.astype(img.dtype)
        else:
            img_f, _ = self.blocks.run(
                self._block_fn, (img, txt), temb, rot, start=self.fn
            )
            self._cached = (img_f - img).astype(jnp.bfloat16)
            # store-on-miss (reference caching/fbcache.py:467-469): hits
            # keep comparing against the last miss's indicator residual
            self._prev_first = first_res
        return self._head(m, img_f, temb)


class OffloadedQwenImageForward:
    """Offloaded forward for QwenImageTransformer2DModel (the reference's
    main offload target: ``set_offload`` streams the 20B Qwen through
    3-4 GB of VRAM, transformer_qwenimage.py:415-451). Embeddings and the
    output head stay resident; the 60-block joint stack streams from host
    RAM with lookahead prefetch."""

    def __init__(self, model, lookahead: int = 1):
        cfg = model.cfg
        self.blocks = BlockStreamer(model.blocks, cfg.num_layers,
                                    lookahead=lookahead)
        self.model = jax.tree_util.tree_map(lambda x: x, model)
        self.model.blocks = None
        self.model.refresh_pytree()

        self._block_fn = jax.jit(
            lambda blk, c, temb, rot: blk(c[0], c[1], temb, rot)
        )
        self._embed = jax.jit(lambda m, *a: m.embed(*a))
        self._head = jax.jit(lambda m, img, temb: m.head(img, temb))

    def __call__(self, hidden_states, encoder_hidden_states, timestep,
                 img_ids, txt_ids=None):
        m = self.model
        img, txt, temb, rot = self._embed(
            m, hidden_states, encoder_hidden_states, timestep, img_ids,
            txt_ids,
        )
        img, txt = self.blocks.run(self._block_fn, (img, txt), temb, rot)
        return self._head(m, img, temb)
