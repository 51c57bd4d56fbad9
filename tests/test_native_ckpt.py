"""Native orbax pipeline checkpoint roundtrip + train-CLI config merging."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.convert.native_ckpt import load_pipeline, save_pipeline
from tests.test_pipeline import tiny_pipeline


def test_pipeline_checkpoint_roundtrip(tmp_path):
    pipe = tiny_pipeline(with_text=False)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    wav0, _ = pipe.generate_from_context(jax.random.PRNGKey(0), ctx, 8)

    save_pipeline(str(tmp_path / "ckpt"), pipe)
    template = jax.tree.map(jnp.zeros_like, pipe.params)
    pipe2 = load_pipeline(str(tmp_path / "ckpt"), pipe.modules, template,
                          schedule=pipe.schedule)
    wav1, _ = pipe2.generate_from_context(jax.random.PRNGKey(0), ctx, 8)
    np.testing.assert_array_equal(np.asarray(wav0), np.asarray(wav1))
    assert pipe2.lcm_config.num_inference_steps == pipe.lcm_config.num_inference_steps


def test_merge_configs_dotlist(tmp_path):
    import yaml

    from audiolcm_tpu.cli.train import merge_configs

    base = {"model": {"params": {"timesteps": 1000, "w_min": 4}}, "data": {"x": 1}}
    override = {"model": {"params": {"w_min": 6}}}
    p1, p2 = tmp_path / "a.yaml", tmp_path / "b.yaml"
    p1.write_text(yaml.safe_dump(base))
    p2.write_text(yaml.safe_dump(override))
    cfg = merge_configs([str(p1), str(p2)], ["--model.params.timesteps", "500",
                                             "--data.y", "hello"])
    assert cfg["model"]["params"]["w_min"] == 6  # right-most yaml wins
    assert cfg["model"]["params"]["timesteps"] == 500  # dotlist wins
    assert cfg["data"] == {"x": 1, "y": "hello"}
