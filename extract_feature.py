#!/usr/bin/env python
"""Standalone batch feature-extraction CLI.

Mirrors the reference CLI's argument surface and on-disk output format
(reference: extract_feature.py:15-148), TPU-native underneath: the whole
per-batch pipeline is one jitted XLA program, batches are sharded over the
device mesh when more than one chip is present.
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diffusion_feature_tpu import FeatureExtractor  # noqa: E402
from diffusion_feature_tpu.io.dump import save_batch  # noqa: E402
from diffusion_feature_tpu.configs import resolve_layer_config  # noqa: E402


def _strict_bool(s):
    v = s.strip().lower()
    if v in ('true', '1', 'yes'):
        return True
    if v in ('false', '0', 'no'):
        return False
    raise argparse.ArgumentTypeError(f'expected true/false, got {s!r}')


def build_parser():
    parser = argparse.ArgumentParser()
    # package settings (reference extract_feature.py:18-29)
    parser.add_argument('--layer', type=str, default=None,
                        help="layer config json: which activations to extract")
    parser.add_argument('--version', type=str, default='xl')
    parser.add_argument('--dtype', type=str, default='bfloat16',
                        choices=('float16', 'float32', 'bfloat16'))
    parser.add_argument('--offline_lora', type=str, default=None)
    parser.add_argument('--offline_lora_filename', type=str, default=None)
    parser.add_argument('--feature_resize', type=int, default=1)
    parser.add_argument('--control', type=str, nargs='+', default=None)
    parser.add_argument('--attention', type=str, nargs='+', default=None,
                        choices=('down_cross', 'mid_cross', 'up_cross',
                                 'down_self', 'mid_self', 'up_self'))
    parser.add_argument('--img_size', type=int, default=1024)
    # extraction settings
    parser.add_argument('--batch_size', '-b', type=int, default=2)
    parser.add_argument('--t', type=int, default=50)
    parser.add_argument('--denoising_from', type=int, default=None)
    parser.add_argument('--use_ddim_inversion', action='store_true')
    # io settings (reference :35-43)
    parser.add_argument('--input_dir', type=str, default=None,
                        help='glob pattern for input images')
    parser.add_argument('--nested_input_dir', action='store_true')
    parser.add_argument('--prompt_file', type=str, default='prompt.txt')
    parser.add_argument('--prompt', type=str, default=None,
                        help='inline prompt (alternative to --prompt_file)')
    parser.add_argument('--output_dir', type=str, default='./output/')
    parser.add_argument('--aggregate_output', action='store_true')
    parser.add_argument('--use_original_filename', action='store_true')
    parser.add_argument('--split', type=str, default='train')
    parser.add_argument('--sample_name_first', action='store_true')
    # tpu-specific
    parser.add_argument('--weights', type=str, default=None,
                        help='local diffusers checkpoint dir')
    parser.add_argument('--weights_variant', type=str, default=None,
                        help="weight-set variant to load from a component "
                             "dir carrying several (e.g. 'fp16', or 'main' "
                             'for the un-suffixed set); default: the main '
                             'set, else the single variant present')
    parser.add_argument('--dp', type=int, default=1,
                        help='shard the batch over a dp device mesh')
    parser.add_argument('--tp', type=int, default=1,
                        help='tensor-parallel shard the denoiser weights '
                             '(qkv/ffn column, out-proj row) over tp devices; '
                             'needed when the model exceeds one chip\'s HBM '
                             '(e.g. Flux-12B bf16 on v5e)')
    parser.add_argument('--sp', type=int, default=1,
                        help='sequence-parallel shard the DiT token dim over '
                             'sp devices (all DiT families: pixart, hunyuan, '
                             'flux; composes with --dp/--tp)')
    parser.add_argument('--transformer_8bit', type=_strict_bool,
                        default=None, metavar='{true,false}',
                        help='int8 weight-only flux transformer (fits 12B on '
                             'one 16-GiB chip); default auto: on for flux '
                             'with --weights unless tp>1 or a LoRA merges')
    # debug / observability
    parser.add_argument('--show_all_layers', action='store_true')
    parser.add_argument('--no_validate_layers', action='store_true',
                        help='skip the unknown-layer-id check (restores the '
                             "reference's silent-drop behavior)")
    parser.add_argument('--profile', type=str, default=None, metavar='DIR',
                        help='capture a jax.profiler trace of the extraction '
                             'loop into DIR (view with xprof/tensorboard)')
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    print(f'Run folder: {args.output_dir}')

    if args.show_all_layers:
        # pure shape enumeration: no weights, no forward pass, milliseconds
        # even for the 12B models (the reference needs a full real forward,
        # extract_feature.py:102-110)
        from diffusion_feature_tpu.enumerate_layers import enumerate_layers
        layer_record = {}
        for k, shape in sorted(enumerate_layers(args.version,
                                                args.img_size).items()):
            print(k, tuple(shape[1:]))
            layer_record[k] = True
        with open('layer_record.json', 'w') as f:
            f.write(json.dumps(layer_record))
        return

    mesh = None
    if args.dp > 1 or args.tp > 1 or args.sp > 1:
        import jax
        from diffusion_feature_tpu.parallel.mesh import make_mesh
        n = args.dp * args.tp * args.sp
        mesh = make_mesh(dp=args.dp, tp=args.tp, sp=args.sp,
                         devices=jax.devices()[:n])
        if args.batch_size % args.dp != 0:
            # round up so every batch dp-shards: the trailing-batch
            # pad-and-slice below already handles surplus slots, so this
            # only ever changes how the same images are grouped — running
            # replicated instead would silently forfeit the dp speedup
            new_bs = -(-args.batch_size // args.dp) * args.dp
            print(f'note: --batch_size {args.batch_size} does not divide '
                  f'--dp {args.dp}; rounding up to {new_bs} so batches '
                  'shard over dp', file=sys.stderr)
            args.batch_size = new_bs

    df = FeatureExtractor(
        resolve_layer_config(args.layer),
        args.version,
        mesh=mesh,
        dtype=args.dtype,
        offline_lora=args.offline_lora,
        offline_lora_filename=args.offline_lora_filename,
        feature_resize=args.feature_resize,
        control=args.control,
        attention=args.attention,
        img_size=args.img_size,
        weights=args.weights,
        weights_variant=args.weights_variant,
        transformer_8bit=args.transformer_8bit,
        validate_layers=not args.no_validate_layers,
    )

    # input list (reference :68-75)
    from PIL import Image
    imgs = sorted(glob.glob(args.input_dir, recursive=True))
    if not imgs:
        print(f'no images matched {args.input_dir!r}', file=sys.stderr)
        sys.exit(1)
    names = []
    for img in imgs:
        if not args.nested_input_dir:
            names.append(os.path.splitext(os.path.basename(img))[0])
        else:
            names.append(os.path.join(
                os.path.basename(os.path.split(img)[0]),
                os.path.splitext(os.path.basename(img))[0]))

    # prompt (reference :77-82)
    if args.prompt is not None:
        prompts_text = args.prompt
    else:
        with open(args.prompt_file) as f:
            prompts_text = f.read()
    print('prompt:', prompts_text)
    if args.version not in ('flux', 'hunyuan'):
        prompts = df.encode_prompt(prompts_text)
    else:
        prompts = prompts_text

    from diffusion_feature_tpu.native import AsyncDumpWriter
    writer = AsyncDumpWriter(n_threads=4)
    if writer.is_native:
        print('native async dump writer active')

    # double-buffered input pipeline: decode ahead of the device
    from diffusion_feature_tpu.io.prefetch import PrefetchLoader
    loader = PrefetchLoader(imgs, args.batch_size,
                            lambda p: Image.open(p).convert('RGB'))

    profiler = None
    if args.profile:
        # host + XLA trace of the steady-state loop (the reference has no
        # profiling story at all, SURVEY §5); best-effort: device traces
        # may be unavailable behind remote-TPU tunnels
        import jax
        try:
            jax.profiler.start_trace(args.profile)
            profiler = True
            print(f'profiling to {args.profile}')
        except Exception as e:
            print(f'profiler unavailable: {e}', file=sys.stderr)

    i = 0
    try:
        for batch_paths, sublist in loader:
            n_real = len(sublist)
            if n_real < args.batch_size:
                # pad short (trailing) batches by repeating the last image
                # and slice the padding off after extraction: the batch dim
                # is a static shape, so a smaller final batch would force a
                # second full compile of the step program (minutes at real
                # size on a 1-core host); this also keeps the batch
                # divisible by the dp mesh axis
                sublist = (list(sublist) +
                           [sublist[-1]] * (args.batch_size - n_real))
            features = df.extract(
                prompts, len(sublist), sublist,
                t=args.t,
                denoising_from=args.denoising_from,
                use_control=args.control is not None,
                use_ddim_inversion=args.use_ddim_inversion,
            )
            # keep the device dtype; save_batch casts to the dump dtype
            features = {k: np.asarray(v)[:n_real]
                        for k, v in features.items()}
            save_batch(
                features, args.output_dir,
                batch_start_index=i,
                original_names=names[i:i + n_real],
                split=args.split,
                use_original_filename=args.use_original_filename,
                sample_name_first=args.sample_name_first,
                aggregate_output=args.aggregate_output,
                nested=args.nested_input_dir,
                writer=writer,
            )
            i += n_real
            print(f'{i}/{len(imgs)}')
    finally:
        # dumps already submitted must land on disk, and the trace must
        # survive mid-loop failures (its whole point on long runs)
        writer.close()
        if profiler:
            import jax
            jax.profiler.stop_trace()
            print(f'profile written to {args.profile}')


if __name__ == '__main__':
    main()
