"""configs/presets.get_celeba_configs must mirror the reference's orphan
preset module (reference configs/celeba.py:1-50) key-for-key, value-for-value
— cross-executed against the reference module itself."""
import sys

import pytest

from asyrp_official_tpu.configs.presets import args_from_preset, get_celeba_configs


def _load_reference_preset():
    sys.path.insert(0, "tests/refshims")
    try:
        import refboot
    finally:
        sys.path.pop(0)
    mod = refboot.load_ref_module("configs_celeba", filename="configs/celeba.py")
    return mod.get_celeba_configs()


def test_preset_matches_reference_exactly():
    ml = pytest.importorskip("ml_collections")  # the reference needs it
    del ml
    ref = _load_reference_preset()
    ours = get_celeba_configs()
    ref_d = dict(ref)
    assert set(ref_d) == set(ours)
    for k, v in ref_d.items():
        assert ours[k] == v, (k, ours[k], v)
        assert type(ours[k]) is type(v), (k, type(ours[k]), type(v))


def test_preset_drives_cli_parser():
    """Preset keys the CLI knows go through the parser (validation + exp
    naming apply); vestigial-only keys land on the namespace verbatim."""
    args = args_from_preset(get_celeba_configs())
    assert args.edit_attr == "smiling"
    assert args.n_train_img == 100
    assert args.bs_train == 4
    assert args.seed == 1234
    assert args.sample_type == "ddim"
    # vestigial-only keys carried over
    assert args.run_each_layer_clip is True or args.run_each_layer_clip == 1
    # align_face must NOT route through the live flag: inert in the
    # reference (parsed, never dispatched), active here — the preset keeps
    # the reference's EFFECTIVE behavior (no alignment) unless opted in
    assert args.align_face == 0
    opted = args_from_preset(get_celeba_configs(),
                             extra=["--align_face", "1"])
    assert opted.align_face == 1
