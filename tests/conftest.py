"""Test config: run JAX on CPU with 8 virtual devices so sharding /
multi-chip code paths are exercised without TPU hardware (the standard JAX
fake-multihost trick; see SURVEY.md §4)."""

import os

# Force CPU with 8 virtual devices. The container boots jax through the
# axon TPU-tunnel plugin (sitecustomize sets jax_platforms itself), so env
# vars alone don't stick — override the config before any backend
# initialization instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import sys  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# tools/ holds the superseded-kernel archive (tools/pallas_archive.py)
# whose parity tests keep the docs/PERFORMANCE.md journey reproducible
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# ---------------------------------------------------------------------------
# Round-5 retiering (VERDICT #8): the fast tier had crept to ~48 min on the
# 1-vCPU judge box. Model-sweep tests keep ONE-TWO representatives per
# family in the fast tier; the full sweeps run with `-m ""` (make
# test-all / CI / the autoflip gates, which pass `-m ""` explicitly).
# Times from /tmp/r5_durations.log (pytest --durations, 2026-08-20).
# ---------------------------------------------------------------------------

# whole functions that leave the fast tier (redundant with driver checks,
# or single >25s items with cheaper siblings covering the same surface)
_TIER_SLOW_FN = {
    "test_graft_entry_dryrun",            # 149s; driver runs dryrun itself
    "test_spatial_pooling_flash_gate",    # 146s; flash nl covered in test_nl_kernel others
    "test_multiscale_parity_odd_width_2tiles",  # 60s; 4tiles rep stays
    "test_cli_tiles_inference",           # 45s; cli e2e roundtrip stays
    "test_two_process_train_smoke",       # 36s subprocess; multihost slow tier
    "test_deepfuse_s2d_io_path_bit_identical",  # 31s; s2d chain parity stays
    "test_multiscale_parity_under_jit_batch",   # 29s
    "test_chain_conv_channel_chunked_wide_layer",  # 23s
    "test_two_stage_training",            # 62s; AE flow covered by test_autoencoder_mode + resume
    "test_multiscale_spatial_parity_4dev",  # 62s; single-scale spatial reps stay fast
    # -- second pass (durations 2026-08-20, warm 862s -> target ~600s) --
    "test_spatial_train_step_matches_single_device",  # 42s; dryrun leg 5 + fwd spatial reps stay
    "test_multiscale_parity_4tiles",      # 30s; tiling non-default, 4tiles single-scale reps stay
    "test_myfusion_share_levels",         # 36s; forward_parity[default] + design_space reps stay
    "test_multiscale_rejects_misaligned_slabs",  # 16s error path
    "test_parity_2dev_top_bottom_only",   # 16s; 8dev+batch and 4dev model reps stay
    "test_five_step_loss_trajectory_matches_single_device",  # 13s; single-step DP parity stays
}

# param sweeps: ids kept in the fast tier (everything else -> slow)
_TIER_KEEP = {
    "test_model_chain_fast_path_parity": {"densefuse"},
    "test_odd_input_sizes": {"deepfuse-size0", "sedrfuse-size1"},
    "test_parity_all_eligible_models_4dev": {"deepfuse", "nestfuse"},
    "test_zoo_forward_parity": {"deepfuse", "densefuse", "sedrfuse"},
    "test_forward_shapes": {"deepfuse", "densefuse", "vifnet", "ifcnn",
                            "difnet", "pmgi", "pfnetv1"},
    "test_param_count_matches_reference": {
        "deepfuse", "densefuse", "vifnet", "ifcnn", "difnet", "pmgi",
        "pfnetv1", "pfnetv2", "dbnet"},
    "test_model_hiw_path_parity": {"densefuse"},
    "test_myfusion_forward_parity": {"default"},
    "test_autoencoder_mode": {"densefuse"},
    "test_myfusion_design_space": {"plain-mix", "nest-sep"},
    "test_parity_all_eligible_models_4tiles": {"densefuse", "ifcnn"},
    "test_convert_structure": {"deepfuse", "densefuse", "vifnet",
                               "ifcnn", "difnet", "pmgi", "pfnetv1",
                               "pfnetv2", "dbnet", "sedrfuse",
                               "nestfuse", "rfnnest", "res2fusion"},
}


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    for item in items:
        name = item.originalname or item.name
        if name in _TIER_SLOW_FN:
            item.add_marker(slow)
            continue
        keep = _TIER_KEEP.get(name)
        if keep is not None:
            pid = item.callspec.id if hasattr(item, "callspec") else ""
            if pid not in keep:
                item.add_marker(slow)


@pytest.fixture(scope="session")
def golden():
    """Loader for golden fixture files generated from the PyTorch reference
    (tools/gen_golden.py)."""

    cache = {}

    def load(name):
        if name not in cache:
            cache[name] = np.load(os.path.join(GOLDEN_DIR, name + ".npz"))
        return cache[name]

    return load


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))
