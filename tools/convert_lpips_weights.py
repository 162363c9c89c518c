"""Convert official LPIPS(net='vgg') weights to the npz consumed by
thr3ed_atom_tpu.utils.lpips.

Run OFFLINE on a machine with network access (this deployment has none):

    pip install lpips torchvision
    python tools/convert_lpips_weights.py -o lpips_vgg_weights.npz

then ship the npz and point THR3ED_LPIPS_WEIGHTS at it (or pass weights_path).
The tester will report calibrated ``lpips_vgg`` scores instead of the seeded
random-feature fallback ``lpips_rand_vgg``.
"""
import click
import numpy as np


@click.command()
@click.option("-o", "--output_path", type=click.Path(dir_okay=False), required=True)
def main(output_path: str) -> None:
    import lpips as lpips_pkg  # noqa: F401 (downloads VGG16 + linear heads)
    import torch

    model = lpips_pkg.LPIPS(net="vgg")
    arrays = {}
    conv_i = 0
    for layer in model.net.slice1 + model.net.slice2 + model.net.slice3 + \
            model.net.slice4 + model.net.slice5:
        if isinstance(layer, torch.nn.Conv2d):
            # torch OIHW -> jax HWIO
            arrays[f"conv{conv_i}_w"] = (
                layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            )
            arrays[f"conv{conv_i}_b"] = layer.bias.detach().numpy()
            conv_i += 1
    for i, lin in enumerate(model.lins):
        arrays[f"lin{i}_w"] = (
            lin.model[-1].weight.detach().numpy().reshape(-1)
        )
    arrays["calibrated"] = np.ones((), np.float32)
    np.savez(output_path, **arrays)
    print(f"wrote {output_path} ({conv_i} convs, {len(model.lins)} linear heads)")


if __name__ == "__main__":
    main()
