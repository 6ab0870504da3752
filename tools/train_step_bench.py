#!/usr/bin/env python
"""On-chip throughput for the reference's PRIMARY workload: training a
downstream head THROUGH the frozen extractor (VERDICT r4 item 2).

The reference exists to train task heads for 80k iterations over frozen
diffusion features (reference segmentation/train.py:93-100 "1 GPU, 80k
iters"; correspondence/task-corres.py:144-187). Extraction *forward* is
benched six ways in bench.py; this tool times the full TRAIN step — the
backward path's first perf evidence — as ONE fused jitted program per task:

  seg    — frozen real-size SDXL extraction at the PRODUCTION img_size
           1024 (seg_configs/ade_sdxl.json: 512² train crops are upsampled
           into the extractor; the ade_sdxl tap set: 2x1280 level-0 +
           2x640 level-1) → fp32 ResBlock
           adapters → UPerHead + FCNHead → CE + Lovasz → backward over the
           head params → AdamW (PolyLR), mirroring train_segmentation.py's
           production composition (its extract program + _head_step compile
           into one program here — same ops, one dispatch).
  corres — TWO frozen SDXL extractions at 1024² (source + target image,
           corres_configs/config_sdxl.json img_size) → per-tap bilinear
           resize to 128² → channel concat (3840) → 3x3 aggregation conv →
           bidirectional CLIP CE over 20 point pairs → backward over
           {out_kernel} → AdamW, mirroring task_corres.py.

Timing discipline (CLAUDE.md): N steps inside one jitted lax.fori_loop with
the images perturbed per iteration (nothing loop-invariant), wall clock
closed over a host readback of the loss accumulator. Reports steps/s,
img/s, FLOP/step (XLA cost analysis), and the 80k-iteration wall-clock
extrapolation vs the reference's single-GPU schedule.

Usage:  python tools/train_step_bench.py [seg|corres|both]
        TRAIN_BENCH_BATCH=2 TRAIN_BENCH_ITERS=10 (defaults; batch is the
        seg batch — reference samples_per_gpu=2 — corres is pair-at-a-time)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # repo-root benchmark builders (bench_xl model pair)


def _mem_stats():
    import jax
    try:
        s = jax.devices()[0].memory_stats() or {}
        peak = s.get('peak_bytes_in_use')
        return round(peak / 2**30, 2) if peak else None
    except Exception:
        return None


def _run_loop(train_step, carry0, static_args, iters, img_args):
    """Fuse ``iters`` train steps into one program: carry the mutable train
    state through lax.fori_loop, re-draw the image batch(es) each iteration
    (img_args names the static_args indices to perturb)."""
    import jax
    import jax.numpy as jnp

    def run(carry0, *static_args):
        def body(i, carry):
            state, rng, acc = carry
            rng, rp, rs = jax.random.split(rng, 3)
            a = list(static_args)
            for k, idx in enumerate(img_args):
                a[idx] = a[idx] + jax.random.normal(
                    jax.random.fold_in(rp, k), a[idx].shape,
                    a[idx].dtype) * 0.01
            state, loss = train_step(state, a, rs)
            return (state, rng, acc + loss.astype(jnp.float32))
        carry = (carry0, jax.random.PRNGKey(1), jnp.float32(0))
        state, _, acc = jax.lax.fori_loop(0, iters, body, carry)
        return acc

    t0 = time.perf_counter()
    compiled = jax.jit(run).lower(carry0, *static_args).compile()
    compile_s = time.perf_counter() - t0
    # NOTE: no cost_analysis here — XLA's HLO cost analysis visits a while
    # body once regardless of trip count, so flops of the fori_loop program
    # would undercount by ~iters×. Per-mode FLOP accounting lives in
    # tools/mfu_accounting.py, which lowers the SINGLE step.
    _ = float(np.asarray(compiled(carry0, *static_args)))  # warm run
    t0 = time.perf_counter()
    acc = float(np.asarray(compiled(carry0, *static_args)))
    dt = time.perf_counter() - t0
    assert np.isfinite(acc), 'loss accumulator went non-finite'
    return dt, compile_s


def bench_seg(batch, iters):
    import jax
    import jax.numpy as jnp
    import optax
    from diffusion_feature_tpu.tasks.segmentation.segmentor import SegHead
    from diffusion_feature_tpu.tasks.segmentation.losses import (
        segmentation_loss)

    crop = 512
    # Production composition (seg_configs/ade_sdxl.json): the 512² train
    # crop is upsampled to the extractor's img_size 1024 — extraction runs
    # at the full 1024² SDXL shape (16k-token level-0 self-attention), the
    # loss at the 512² label crop. TRAIN_BENCH_EXTRACT_SIZE=512 restores
    # the cheaper crop-resolution variant for comparison.
    extract_size = int(os.environ.get('TRAIN_BENCH_EXTRACT_SIZE', '1024'))
    extract_step, args = bench.bench_xl(batch, img_size=extract_size)
    # ade_sdxl feature wiring (seg_configs/ade_sdxl.json — the bench_xl tap
    # set IS the ade_sdxl layer set)
    feature_layers = (
        (('up-level0-repeat0-vit-block7-out', 1280),
         ('up-level0-repeat0-vit-block5-out', 1280)),
        (('up-level1-repeat0-vit-block0-cross-q', 640),
         ('up-level1-repeat0-vit-block0-out', 640)),
    )
    head = SegHead(model_feature_layers=(feature_layers,),
                   num_classes=150, head_channels=512, pool_scales=(1, 2),
                   aux_in_index=1)

    rng = jax.random.PRNGKey(0)
    feat_shapes = jax.eval_shape(extract_step, *args, rng)
    feats0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), feat_shapes)
    variables = head.init(rng, feats0, train=False)
    head_params = variables['params']
    batch_stats = variables.get('batch_stats', {})

    # train_segmentation.py:175-178 — PolyLR AdamW over the 80k schedule
    sched = optax.polynomial_schedule(init_value=1.6e-4, end_value=1e-4,
                                      power=0.9, transition_steps=80_000)
    opt = optax.adamw(sched, weight_decay=0.001)
    opt_state = opt.init(head_params)

    labels = jnp.asarray(
        np.where(np.random.RandomState(0).rand(batch, crop, crop) < 0.05,
                 255,
                 np.random.RandomState(1).randint(
                     0, 150, (batch, crop, crop))), jnp.int32)

    def train_step(state, a, rs):
        head_params, batch_stats, opt_state = state
        r_ex, r_do = jax.random.split(rs)
        feats = extract_step(*a[:-1], r_ex)          # a[-1] is labels
        feats = jax.tree.map(jax.lax.stop_gradient, feats)
        labels = a[-1]

        def lf(p, bs):
            (decode, aux), upd = head.apply(
                {'params': p, 'batch_stats': bs}, feats, train=True,
                dropout_rng=r_do, mutable=['batch_stats'])
            hw = labels.shape[-2:]

            def up(x):
                b, c = x.shape[:2]
                return jax.image.resize(x, (b, c) + tuple(hw),
                                        method='bilinear')
            total, _ = segmentation_loss(up(decode), up(aux), labels)
            return total, upd['batch_stats']
        (loss, new_bs), grads = jax.value_and_grad(lf, has_aux=True)(
            head_params, batch_stats)
        updates, opt_state = opt.update(grads, opt_state, head_params)
        head_params = optax.apply_updates(head_params, updates)
        return (head_params, new_bs, opt_state), loss

    static = args + (labels,)
    dt, compile_s = _run_loop(
        train_step, (head_params, batch_stats, opt_state), static, iters,
        img_args=(2,))                       # (unet, vae, img, ...) — img
    steps_per_s = iters / dt
    return {
        'metric': f'seg_train_step_sdxl{extract_size}_ade',
        'value': round(steps_per_s, 3),
        'unit': 'steps/s',
        'img_per_s': round(steps_per_s * batch, 2),
        'batch': batch,
        'compile_s': round(compile_s, 1),
        'iters_80k_hours': round(80_000 / steps_per_s / 3600, 2),
        'peak_hbm_gib': _mem_stats(),
    }


def bench_corres(iters):
    import jax
    import jax.numpy as jnp
    import optax
    from diffusion_feature_tpu.ops.resize import interpolate_bilinear_nchw
    from diffusion_feature_tpu.tasks.correspondence.utils import (
        batch_cosine_sim)

    img_size = 1024                      # corres_configs/config_sdxl.json
    n_points = 20
    extract_step, args = bench.bench_xl(1, img_size=img_size)
    feature_dim = 3840                   # xl-practical feature_len

    rng = jax.random.PRNGKey(0)
    out_kernel = jax.nn.initializers.he_normal()(
        rng, (3, 3, feature_dim, feature_dim), jnp.float32)
    opt = optax.adamw(5e-4, weight_decay=0.01)   # task_corres.py:96,121
    opt_state = opt.init({'out_kernel': out_kernel})
    logit_scale = float(np.log(1 / 0.07))

    ridx = np.random.RandomState(0)
    src_idx = jnp.asarray(ridx.randint(0, 128 * 128, n_points), jnp.int32)
    tgt_idx = jnp.asarray(ridx.randint(0, 128 * 128, n_points), jnp.int32)

    def aggregate(a, r):
        feats = extract_step(*a, r)
        parts = [interpolate_bilinear_nchw(feats[k].astype(jnp.float32),
                                           (128, 128))
                 for k in sorted(feats)]
        return jax.lax.stop_gradient(jnp.concatenate(parts, axis=1))

    def conv(kernel, x):
        x = x.transpose(0, 2, 3, 1)
        x = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding='SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return x.transpose(0, 3, 1, 2)

    # source + target get independent image/ctx args; the model params
    # (first two entries) are shared between the two extractions
    static = args + args[2:]

    def train_step(state, a, rs):
        params, opt_state = state
        src = tuple(a[:len(args)])
        tgt = tuple(a[:2]) + tuple(a[len(args):])
        r1, r2 = jax.random.split(rs)
        f_src = aggregate(src, r1)
        f_tgt = aggregate(tgt, r2)

        def lf(p):
            img1 = conv(p['out_kernel'], f_src)
            img2 = conv(p['out_kernel'], f_tgt)
            scale = jnp.exp(jnp.float32(logit_scale))
            sl = scale * batch_cosine_sim(img1, img2)
            tl = scale * batch_cosine_sim(img2, img1)
            ls = optax.softmax_cross_entropy_with_integer_labels(
                sl[0, src_idx], tgt_idx).mean()
            lt = optax.softmax_cross_entropy_with_integer_labels(
                tl[0, tgt_idx], src_idx).mean()
            return (ls + lt) / 2
        loss, grads = jax.value_and_grad(lf)(
            {'out_kernel': params['out_kernel']})
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    dt, compile_s = _run_loop(
        train_step, ({'out_kernel': out_kernel}, opt_state), static,
        iters, img_args=(2, len(args)))  # perturb src AND tgt images
    steps_per_s = iters / dt
    return {
        'metric': 'corres_train_step_sdxl1024_pair',
        'value': round(steps_per_s, 3),
        'unit': 'pairs/s',
        'batch': 1,
        'compile_s': round(compile_s, 1),
        'iters_80k_hours': round(80_000 / steps_per_s / 3600, 2),
        'peak_hbm_gib': _mem_stats(),
    }


def bench_unet(batch, iters, img_size=1024):
    """train_unet=True fine-tuning (reference diffusion_feature.py:87-89 —
    the U-Net itself is exposed to the optimizer, feature/output loss) at
    REAL SD-1.5 size and the 1024² shape where the level-0 self-attention
    runs at 16384 tokens: the forward rides the Pallas flash kernel and
    the backward the chunked O(sk·chunk) VJP (the one-shot einsum backward
    would materialize b·8·16384²·4 = 8 GiB/img of fp32 scores). bf16
    params + fp32 AdamW moments; VAE encode frozen under stop_gradient."""
    import jax
    import jax.numpy as jnp
    import optax
    from diffusion_feature_tpu.models.unet2d import (
        UNet2DConditionModel, SD15_UNET)
    from diffusion_feature_tpu.models.vae import AutoencoderKL, SD_VAE
    from diffusion_feature_tpu.taps import TapSpec, flatten_taps

    dtype = jnp.bfloat16
    taps = TapSpec.from_config({'up-level1-repeat0-res-out': True})
    unet = UNet2DConditionModel(cfg=SD15_UNET, dtype=dtype, taps=taps)
    vae = AutoencoderKL(cfg=SD_VAE, dtype=dtype)
    lat = img_size // 8
    rng = jax.random.PRNGKey(0)
    ctx = jnp.zeros((batch, 77, 768), dtype)
    unet_params = bench.to_bf16(UNet2DConditionModel(
        cfg=SD15_UNET, dtype=dtype).init(
            rng, jnp.zeros((1, 4, lat, lat), dtype), 50,
            jnp.zeros((1, 77, 768), dtype))['params'])
    vae_params = bench.to_bf16(vae.init(
        rng, jnp.zeros((1, 3, img_size, img_size), dtype),
        method=AutoencoderKL.full_pass)['params'])
    img = jax.random.uniform(rng, (batch, 3, img_size, img_size), dtype)

    opt = optax.adamw(1e-5, weight_decay=0.01)
    opt_state = opt.init(unet_params)

    def train_step(state, a, rs):
        unet_params, opt_state = state
        img, ctx = a
        latents = jax.lax.stop_gradient(
            vae.apply({'params': vae_params}, img, rs))

        def lf(p):
            out, st = unet.apply({'params': p}, latents, 50.0, ctx,
                                 mutable=['taps'])
            flat = flatten_taps(st['taps'])
            loss = jnp.mean(out.astype(jnp.float32) ** 2)
            for v in flat.values():
                loss = loss + jnp.mean(v.astype(jnp.float32) ** 2)
            return loss
        loss, grads = jax.value_and_grad(lf)(unet_params)
        updates, opt_state = opt.update(grads, opt_state, unet_params)
        unet_params = optax.apply_updates(unet_params, updates)
        return (unet_params, opt_state), loss

    dt, compile_s = _run_loop(train_step, (unet_params, opt_state),
                              (img, ctx), iters, img_args=(0,))
    steps_per_s = iters / dt
    return {
        'metric': f'train_unet_sd15_{img_size}',
        'value': round(steps_per_s, 3),
        'unit': 'steps/s',
        'img_per_s': round(steps_per_s * batch, 2),
        'batch': batch,
        'compile_s': round(compile_s, 1),
        'iters_80k_hours': round(80_000 / steps_per_s / 3600, 2),
        'peak_hbm_gib': _mem_stats(),
    }


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else 'both'
    assert mode in ('seg', 'corres', 'both', 'unet'), mode
    import jax
    on_tpu = jax.devices()[0].platform == 'tpu'
    batch = int(os.environ.get('TRAIN_BENCH_BATCH', '2'))
    iters = int(os.environ.get('TRAIN_BENCH_ITERS', '10' if on_tpu else '2'))
    if mode in ('seg', 'both'):
        print(json.dumps(bench_seg(batch, iters)))
    if mode in ('corres', 'both'):
        print(json.dumps(bench_corres(iters)))
    if mode == 'unet':
        print(json.dumps(bench_unet(
            int(os.environ.get('TRAIN_BENCH_BATCH', '1')), iters)))


if __name__ == '__main__':
    main()
