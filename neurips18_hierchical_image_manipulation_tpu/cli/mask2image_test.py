"""mask2image test/inference driver (SURVEY.md C25, call stack §4.3):
load nets at --which_epoch, run --how_many samples, dump an HTML gallery
into --results_dir."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.options import MaskToImageTestOptions, parse_cli
from ..data.loader import CreateDataLoader
from ..models.factory import create_model
from ..utils import html as html_mod
from ..utils.checkpoint import CheckpointManager
from ..utils.imaging import tensor2im, tensor2label
from ..utils.visualizer import Visualizer


def restore_params(opt, model, sample_batch):
    params = jax.jit(lambda r: model.init_params(r, sample_batch))(
        jax.random.PRNGKey(opt.seed)
    )
    params.pop("VGG", None)
    ckpt = CheckpointManager(opt)
    if ckpt.has_params(opt.which_epoch):
        params = ckpt.restore_params(opt.which_epoch, params)
        print(f"restored checkpoint '{opt.which_epoch}'")
        return params
    print("WARNING: no checkpoint found — using random init")
    return params


def main(argv=None):
    opt = parse_cli(MaskToImageTestOptions, argv)
    loader = CreateDataLoader(opt)
    model = create_model(opt)
    visualizer = Visualizer(opt)

    web_dir = os.path.join(opt.results_dir, opt.name, f"{opt.phase}_{opt.which_epoch}")
    webpage = html_mod.HTML(
        web_dir, f"Experiment = {opt.name}, Phase = {opt.phase}, Epoch = {opt.which_epoch}"
    )

    # cluster-sampled instance features (reference --cluster_path flow):
    # when instance_feat is on and the clusters npy exists, every instance
    # region is painted with a cluster center of its class instead of
    # encoding the (possibly unavailable) real image (SURVEY C15/§3.3)
    clusters = None
    if getattr(opt, "instance_feat", False) and not opt.use_encoded_image:
        if os.path.exists(opt.cluster_path):
            clusters = np.load(opt.cluster_path)
            print(f"loaded feature clusters {clusters.shape} from {opt.cluster_path}")

    def make_fwd(params):
        if getattr(opt, "spatial_shards", 0) and opt.spatial_shards > 1:
            # W-sharded generator inference over a device mesh (SURVEY
            # §6.7): conditioning is built with the literal (unpacked)
            # encode, then every generator layer runs on W shards with
            # ppermute halos (parallel/spatial.py).
            assert opt.netG in ("global", "local"), (
                "--spatial_shards needs netG=global or local"
            )
            assert not model.use_features(), (
                "--spatial_shards is incompatible with encoder features"
            )
            from jax.sharding import Mesh, NamedSharding
            from jax.sharding import PartitionSpec as P

            from ..ops import boxcomposite, onehot_edges
            from ..parallel import spatial

            devs = np.array(jax.devices()[: opt.spatial_shards])
            assert len(devs) == opt.spatial_shards, (
                f"need {opt.spatial_shards} devices, have {len(jax.devices())}"
            )
            mesh = Mesh(devs, ("data",))
            if opt.netG == "local":
                sp = spatial.make_spatial_local_enhancer(
                    mesh,
                    params["G"],
                    n_downsample_global=opt.n_downsample_global,
                    n_blocks_global=opt.n_blocks_global,
                    n_local_enhancers=opt.n_local_enhancers,
                    n_blocks_local=opt.n_blocks_local,
                )
            else:
                sp = spatial.make_spatial_generator(
                    mesh,
                    params["G"],
                    n_downsampling=opt.n_downsample_global,
                    n_blocks=opt.n_blocks_global,
                )
            print(f"spatial inference: W sharded over {opt.spatial_shards} devices")
            wspec = NamedSharding(mesh, P(None, None, "data", None))

            # ONE jitted program per batch: the conditioning build is
            # constrained to the same W sharding as the generator, so the
            # full-res one-hot never materializes on a single device and
            # there is no per-batch eager dispatch
            def fwd_impl(_p, b):
                inst = None if opt.no_instance else b["inst"]
                img = b.get("image")
                if img is not None and img.dtype == jnp.uint8:
                    img = img.astype(jnp.float32) / 127.5 - 1.0
                if getattr(opt, "use_masked_image", False):
                    rgb = boxcomposite.mask_box(img, b["boxes"], fill=0.0)
                    g = onehot_edges.encode_input_rgb(
                        b["label"], inst, rgb, opt.label_nc
                    )
                else:
                    g = onehot_edges.encode_input(b["label"], inst, opt.label_nc)
                g = jax.lax.with_sharding_constraint(g, wspec)
                return sp(g)

            return jax.jit(fwd_impl)
        return jax.jit(lambda p, b: model.inference(p, b))

    params = None
    fwd = None
    done = 0
    for host_batch in loader:
        batch = {k: jnp.asarray(v) for k, v in host_batch.items() if not isinstance(v, list)}
        if clusters is not None:
            from ..eval.features import sample_cluster_features

            batch["feat"] = jnp.asarray(
                sample_cluster_features(clusters, np.asarray(host_batch["inst"]))
            )
        if params is None:
            params = restore_params(opt, model, batch)
            fwd = make_fwd(params)
        fake = np.asarray(jax.device_get(fwd(params, batch)))
        for i in range(fake.shape[0]):
            visuals = {
                "input_label": tensor2label(host_batch["label"][i], opt.label_nc),
                "synthesized_image": tensor2im(fake[i]),
            }
            if opt.aspect_ratio != 1.0:
                # reference save_images: stretch W by aspect_ratio
                from PIL import Image as _Image

                for k, v in visuals.items():
                    h, w = v.shape[:2]
                    visuals[k] = np.asarray(
                        _Image.fromarray(v).resize(
                            (int(w * opt.aspect_ratio), h), _Image.BICUBIC
                        )
                    )
            if "image" in host_batch:
                visuals["real_image"] = tensor2im(host_batch["image"][i])
            visualizer.save_images(webpage, visuals, host_batch["path"][i])
            done += 1
            if done >= opt.how_many:
                break
        if done >= opt.how_many:
            break
    webpage.save()
    print(f"wrote {done} results to {web_dir}")


if __name__ == "__main__":
    main()
