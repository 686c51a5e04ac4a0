"""CLI model-matrix coverage: `cli/infer.py::build_models` must offer every
reference inference config (`inference_paper.py:150-170` EDSR/RDN/SWIN paper,
`inference_enhenced.py:40-52, 219-222` EDSR/RDN/SWIN/HATL enhanced/ultra)
with the right decoder family and denominator.
"""

import jax
import jax.numpy as jnp
import pytest

from gsasr_tpu.cli.infer import MODEL_ENCODERS, build_models


@pytest.mark.parametrize("model,version,dec_kind,denom", [
    ("EDSR", "paper", "fea2gs", 12),
    ("RDN", "paper", "fea2gs", 12),
    ("SWIN", "paper", "fea2gs", 24),
    ("EDSR", "enhanced", "fea2gs_rope", 12),
    ("RDN", "enhanced", "fea2gs_rope", 12),
    ("SWIN", "enhanced", "fea2gs_rope", 16),
    ("HATL", "enhanced", "fea2gs_rope", 16),
    ("HATL", "ultra", "fea2gs_rope", 16),
])
def test_build_models_matrix(model, version, dec_kind, denom):
    enc, dec, enc_kind, dk, d = build_models(model, version)
    assert dk == dec_kind and d == denom
    assert enc_kind == MODEL_ENCODERS[model]


def test_hatl_paper_rejected():
    with pytest.raises(SystemExit):
        build_models("HATL", "paper")


def test_build_models_init_smoke():
    # cheapest entry: EDSR paper — init + one decoder step on a 12^2 window
    enc, dec, *_ , denom = build_models("EDSR", "paper")
    rng = jax.random.PRNGKey(0)
    ep = enc.init(rng, jnp.zeros((1, denom, denom, 3)))["params"]
    feat = enc.apply({"params": ep}, jnp.zeros((1, denom, denom, 3)))
    assert feat.shape == (1, denom, denom, 64)
