"""Convert a PyTorch reference checkpoint (.pth state_dict from
chenzpstar/Multi-Modal-Image-Fusion) into this framework's flax checkpoint.

Usage:
    python tools/convert_torch_ckpt.py <model_name> <in.pth> <out.ckpt> \
        [key=value ...]

key=value pairs are the MyFusion design-space config the checkpoint was
trained with (reference model.py:630-842), e.g.
    python tools/convert_torch_ckpt.py myfusion my.pth out.ckpt \
        encoder=res2 decoder=plain fusion_method=rfn share_weight_levels=0

The output loads in the test/eval CLIs (it stores params [+ batch_stats]
with a .json metadata sidecar). Requires torch on the host to unpickle the
.pth; the conversion itself is numpy-only (utils/torch_convert.py).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(1)
    model_name, in_path, out_path = sys.argv[1:4]
    cfg = {}
    for kv in sys.argv[4:]:
        k, _, v = kv.partition("=")
        cfg[k] = int(v) if v.lstrip("-").isdigit() else v

    import torch

    from flax import serialization

    from multi_modal_image_fusion_tpu.utils.torch_convert import \
        convert_state_dict

    sd = torch.load(in_path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    variables = convert_state_dict(model_name, sd, **cfg)

    blob = serialization.msgpack_serialize(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {}),
         "step": 0, "opt_state": {}})
    with open(out_path, "wb") as f:
        f.write(blob)
    with open(out_path + ".json", "w") as f:
        json.dump({"model": model_name, "converted_from": in_path,
                   **({"model_cfg": cfg} if cfg else {})}, f, indent=1)
    n = sum(v.size for v in sd.values())
    print(f"converted {model_name}: {n / 1e6:.3f}M params -> {out_path}")


if __name__ == "__main__":
    main()
