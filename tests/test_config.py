"""Config schema tests, including that the reference reproduction configs
validate unchanged (reference vae/utils.py:48-88 schema)."""

import copy
import glob
import json

import pytest

from dvae_tpu.config import (build_model_config, load_config,
                             validate_params)

VALID = {
    "name": "t", "random_seed": 1, "data_dir": "d", "combined_dataset": False,
    "dataset_minibatch_ratios": {}, "checkpoint_dir": "c", "glove_path": "",
    "num_train_examples": -1, "lowercase": True, "reverse_input": False,
    "embedding_dim": 8, "hidden_dim": 8, "num_rnn_layers": 1,
    "bidirectional_encoder": False, "bow_encoder": False,
    "latent_dims": {"total": 4, "polarity": 1}, "epochs": 1, "batch_size": 2,
    "learn_rate": 1e-3, "encoder_dropout": 0.0, "decoder_dropout": 0.0,
    "teacher_forcing_prob": 0.5, "lambdas": {"default": 0.01},
    "adversarial_loss": False, "mi_loss": False,
    "train": True, "validate": False, "test": False,
}


def test_valid_config_passes():
    validate_params(copy.deepcopy(VALID))


def test_missing_key_raises():
    bad = copy.deepcopy(VALID)
    del bad["epochs"]
    with pytest.raises(ValueError, match="missing 'epochs'"):
        validate_params(bad)


def test_wrong_type_raises():
    bad = copy.deepcopy(VALID)
    bad["epochs"] = "ten"
    with pytest.raises(ValueError, match="incorrect type"):
        validate_params(bad)


def test_unknown_key_warns():
    bad = copy.deepcopy(VALID)
    bad["mystery"] = 1
    with pytest.warns(UserWarning, match="mystery"):
        validate_params(bad)


def test_named_latents_exceeding_total_raise():
    bad = copy.deepcopy(VALID)
    bad["latent_dims"] = {"total": 1, "polarity": 2}
    with pytest.raises(ValueError):
        validate_params(bad)


def test_lambdas_need_default_or_per_latent():
    bad = copy.deepcopy(VALID)
    bad["lambdas"] = {"polarity": 0.1}  # content latent has no weight
    with pytest.raises(ValueError, match="lambdas"):
        validate_params(bad)


def test_reference_reproduction_configs_validate():
    paths = glob.glob("/root/reference/reproduction_configs/*/*.json")
    assert len(paths) == 10
    for p in paths:
        with open(p) as f:
            params = json.load(f)
        validate_params(params)


def test_build_model_config_wiring():
    params = copy.deepcopy(VALID)
    params["latent_dims"] = {"total": 6, "polarity": 1, "uncertainty": 1}
    params["adversarial_loss"] = True
    params["mi_loss"] = True
    mc = build_model_config(params, vocab_size=50,
                            label_dims={"polarity": 1, "uncertainty": 3},
                            sos_idx=2, eos_idx=3, max_length=12)
    assert mc.latent_names == ("polarity", "uncertainty", "content")
    assert mc.latent_dims == (1, 1, 4)
    assert mc.dsc_output_dims == (1, 3)
    # adversaries: every (latent, other-label) pair (model.py:323-335)
    assert set(mc.adv_pairs) == {("polarity", "uncertainty"),
                                 ("uncertainty", "polarity"),
                                 ("content", "polarity"),
                                 ("content", "uncertainty")}
    # MI: unordered latent pairs (model.py:337-355)
    assert set(mc.mi_pairs) == {("polarity", "uncertainty"),
                                ("polarity", "content"),
                                ("uncertainty", "content")}
    assert mc.mi_hidden_of(("polarity", "content")) == 5
    # decoder num_layers coerced 1 -> 2 (model.py:123-124)
    assert mc.enc_layers == 1 and mc.dec_layers == 2
    assert mc.total_latent_dim == 6
    assert mc.context_dim == 8  # hidden * 1 layer * 1 direction


def test_dsc_pos_weights_validation():
    params = copy.deepcopy(VALID)
    params["latent_dims"] = {"total": 6, "polarity": 1, "uncertainty": 1}
    label_dims = {"polarity": 1, "uncertainty": 3}
    params["dsc_pos_weights"] = {"uncertainty": 8}
    # non-binary head: rejected
    with pytest.raises(ValueError, match="binary"):
        build_model_config(params, vocab_size=50, label_dims=label_dims,
                           sos_idx=2, eos_idx=3, max_length=12)
    # unknown label: rejected
    params["dsc_pos_weights"] = {"nope": 2.0}
    with pytest.raises(ValueError, match="not a discriminator label"):
        build_model_config(params, vocab_size=50, label_dims=label_dims,
                           sos_idx=2, eos_idx=3, max_length=12)
    # valid: lands in cfg.pos_weights as float pairs
    params["dsc_pos_weights"] = {"polarity": 2}
    mc = build_model_config(params, vocab_size=50, label_dims=label_dims,
                            sos_idx=2, eos_idx=3, max_length=12)
    assert mc.pos_weights == (("polarity", 2.0),)


def test_compute_dtype_auto_resolution():
    from dvae_tpu.config import _resolve_compute_dtype
    assert _resolve_compute_dtype("auto", "scan") == "bfloat16"
    assert _resolve_compute_dtype("auto", "pallas") == "float32"
    # auto+auto -> bf16 (scan+bf16 measured fastest; RESULTS.md round 2)
    assert _resolve_compute_dtype("auto", "auto") == "bfloat16"
    assert _resolve_compute_dtype("bfloat16", "pallas") == "bfloat16"
    import pytest
    with pytest.raises(ValueError):
        _resolve_compute_dtype("fp8", "scan")


def test_prng_impl_validation():
    """prng_impl: 'threefry' (default) and 'rbg' accepted; anything else
    is a named ValueError (validate_params)."""
    import copy
    from dvae_tpu.config import validate_params
    params = copy.deepcopy(VALID)
    validate_params(params)            # default (absent) ok
    params["prng_impl"] = "rbg"
    validate_params(params)
    params["prng_impl"] = "threefry"
    validate_params(params)
    params["prng_impl"] = "philox"
    with pytest.raises(ValueError, match="prng_impl"):
        validate_params(params)
