"""TPU lowering regression tests for every Pallas kernel at PRODUCT
shapes (1080p and 4K) — no device needed: `.trace(...).lower(
lowering_platforms=("tpu",))` runs the Mosaic pass pipeline, which is
where the round-2/3 tiling rejections surfaced ("slice ... must be
aligned to tiling (8)" hard-failed at 4K while 1080p happened to lower).
This enforces the CLAUDE.md rule — test kernels at a 4K-like shape, not
just the shapes that currently work — at the lowering level on every CI
run."""

import jax
import jax.numpy as jnp
import pytest


def _lower(fn, *args, static=(), **kw):
    jax.jit(fn, static_argnames=static).trace(*args, **kw).lower(
        lowering_platforms=("tpu",))


class TestKernelLowering:
    @pytest.mark.parametrize("blocks", [48960, 195840],
                             ids=["1080p", "4k"])
    def test_segment_pack_kernel(self, blocks):
        from flutpu.codec.ops.entropy_pallas import pack_segments_fused
        _lower(pack_segments_fused,
               jnp.zeros((blocks, 64), jnp.int32),
               jnp.zeros((blocks,), jnp.int32),
               static=("seg_g", "seg_words", "interpret"),
               seg_g=16, seg_words=64)

    @pytest.mark.parametrize("blocks", [48960])
    def test_per_block_pack_kernel(self, blocks):
        from flutpu.codec.ops.entropy_pallas import pack_block_bits_fused
        _lower(pack_block_bits_fused,
               jnp.zeros((blocks, 64), jnp.int32),
               jnp.zeros((blocks,), jnp.int32),
               static=("interpret",))

    @pytest.mark.parametrize("shape", [(1088, 1920), (2160, 3840)],
                             ids=["1080p", "4k"])
    def test_full_motion_kernel(self, shape):
        from flutpu.codec.ops.motion_pallas import motion_search_mc_pallas
        z = jnp.zeros(shape, jnp.float32)
        _lower(motion_search_mc_pallas, z, z,
               static=("search_range", "mb", "interpret"), search_range=7)

    @pytest.mark.parametrize("shape", [(1088, 1920), (2160, 3840)],
                             ids=["1080p", "4k"])
    def test_dygrid_motion_kernel(self, shape):
        from flutpu.codec.ops.motion_pallas import \
            motion_search_mc_dygrid_pallas
        z = jnp.zeros(shape, jnp.float32)
        _lower(motion_search_mc_dygrid_pallas, z, z,
               static=("search_range", "mb", "interpret"), search_range=7)

    @pytest.mark.parametrize("shape", [(1088, 1920), (2160, 3840)],
                             ids=["1080p", "4k"])
    def test_dxmajor_motion_kernel(self, shape):
        from flutpu.codec.ops.motion_pallas import \
            motion_search_mc_dxmajor_pallas
        z = jnp.zeros(shape, jnp.float32)
        _lower(motion_search_mc_dxmajor_pallas, z, z,
               static=("search_range", "mb", "interpret"), search_range=7)

    @pytest.mark.parametrize("shape", [(1088, 1920), (2160, 3840)],
                             ids=["1080p", "4k"])
    def test_hier_motion_kernel(self, shape):
        from flutpu.codec.ops.motion_pallas import \
            motion_search_mc_hier_pallas
        z = jnp.zeros(shape, jnp.float32)
        _lower(motion_search_mc_hier_pallas, z, z,
               static=("search_range", "mb", "interpret"), search_range=7)

    @pytest.mark.parametrize("shape", [(544, 960), (1080, 1920)],
                             ids=["1080p", "4k"])
    def test_banded_chroma_mc_kernel(self, shape):
        from flutpu.codec.ops.motion_pallas import chroma_mc_pallas
        hc, wc = shape
        z = jnp.zeros((hc, wc), jnp.float32)
        mv = jnp.zeros((hc // 8, wc // 8, 2), jnp.int32)
        _lower(chroma_mc_pallas, z, z, mv,
               static=("search_range", "interpret"), search_range=7)

    @pytest.mark.parametrize("shape", [(1088, 1920), (2160, 3840)],
                             ids=["1080p", "4k"])
    def test_motion_kernels_under_lax_map(self, shape):
        """The B-frame pass (fvc_mc_encode_chunk_b) runs the search and
        chroma kernels inside a lax.map over gathered anchor references —
        a new structural usage the per-kernel cases don't cover."""
        from flutpu.codec.ops.motion_pallas import (chroma_mc_pallas,
                                                    motion_search_mc_pallas)
        h, w = shape

        def bpass(cur, prev_refs, next_refs, cb, cr):
            def step(xs):
                cy, py, ny, pcb, pcr = xs
                fwd, pf = motion_search_mc_pallas(cy, py, search_range=7)
                bwd, pb = motion_search_mc_pallas(cy, ny, search_range=7)
                fcb, fcr = chroma_mc_pallas(pcb, pcr, fwd, search_range=7)
                return (pf + pb) * 0.5 + fcb.sum() + fcr.sum(), fwd, bwd

            return jax.lax.map(step, (cur, prev_refs, next_refs, cb, cr))

        z = jnp.zeros((2, h, w), jnp.float32)
        c = jnp.zeros((2, h // 2, w // 2), jnp.float32)
        _lower(bpass, z, z, z, c, c)

    @pytest.mark.parametrize("shape,overlay", [
        ((1088, 1920), False), ((2176, 3840), False),
        ((1088, 1920), True), ((480, 640), False)],
        ids=["1080p", "4k", "1080p-burnin", "480p"])
    def test_frontend_kernel(self, shape, overlay):
        """Fused convert+subsample+DCT+quant front end (round 4), with
        and without the in-kernel overlay blend."""
        from flutpu.codec.ops.frontend_pallas import front_end_pallas
        from flutpu.codec.ops.quant import (CHROMA_QTABLE, LUMA_QTABLE,
                                            scale_qtable)
        h, w = shape
        qy = jnp.asarray(scale_qtable(LUMA_QTABLE, 85))
        qc = jnp.asarray(scale_qtable(CHROMA_QTABLE, 85))
        p = jnp.zeros((2, h, w), jnp.uint8)
        ovp = (jnp.zeros((h, w), jnp.uint8),) * 4 if overlay else None
        _lower(lambda r, g, b, o=None: front_end_pallas(
            r, g, b, qy, qc, overlay_planes=o), p, p, p, ovp)

    @pytest.mark.parametrize("frames", [16, 32], ids=["gop16", "gop32"])
    def test_batched_dispatch_program(self, frames):
        """The FLUTPU_BENCH_GOP batched-dispatch arms (16/32 frames per
        program, amortizing the per-round-trip link cost) lower for TPU
        end to end: source → fused front end → segmented entropy pack at
        the 1080p product shape."""
        from flutpu.codec.ops.entropy import (encode_gop_scans_segmented,
                                              mcu_layout)
        from flutpu.codec.ops.frontend_pallas import front_end_pallas
        from flutpu.codec.ops.quant import (CHROMA_QTABLE, LUMA_QTABLE,
                                            scale_qtable)
        from flutpu.codec.ops.testsrc import gradient_ball_planes

        ph, pw = 1088, 1920
        layout = mcu_layout(pw // 8, ph // 8, pw // 16, ph // 16, True)
        qy = jnp.asarray(scale_qtable(LUMA_QTABLE, 85))
        qc = jnp.asarray(scale_qtable(CHROMA_QTABLE, 85))
        from flutpu.codec.jpeg import (blockize, zigzag_flatten)

        def prog(start):
            r, g, b = gradient_ball_planes(ph, pw, frames, start)
            yp, cbp, crp = front_end_pallas(r, g, b, qy, qc)
            yq, cbq, crq = (zigzag_flatten(blockize(p))
                            for p in (yp, cbp, crp))
            return encode_gop_scans_segmented(
                yq, cbq, crq, layout=layout, prefix_words=4096,
                seg_words=64)

        _lower(prog, jnp.float32(0))
