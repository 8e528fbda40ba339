"""End-to-end data pipeline: synthetic corpora -> datasets -> packer ->
static batch -> train step."""

import io
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from bagel_tpu.configs import micro_bagel
from bagel_tpu.data.datasets import (
    SftJSONLIterableDataset,
    T2IIterableDataset,
    UnifiedEditIterableDataset,
)
from bagel_tpu.data.packing import (
    PackedBatchIterator,
    PackerConfig,
    SequenceBuilder,
    encode_vae_images,
    finalize,
)
from bagel_tpu.data.tokenizer import MockTokenizer
from bagel_tpu.data.transforms import ImageTransform
from bagel_tpu.models.bagel import init_bagel_params
from bagel_tpu.train import compute_losses


def _rand_image(rng, w, h):
    return Image.fromarray(
        rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB"
    )


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)

    # T2I parquet: {image: bytes, captions: json}
    t2i_dir = root / "t2i"
    t2i_dir.mkdir()
    rows = []
    for i in range(8):
        img = _rand_image(rng, 40 + 8 * (i % 3), 48)
        import io

        buf = io.BytesIO()
        img.save(buf, "PNG")
        rows.append({
            "image": buf.getvalue(),
            "captions": json.dumps({"default": f"an image number {i}"}),
        })
    table = pa.Table.from_pylist(rows)
    pq.write_table(table, t2i_dir / "part0.parquet", row_group_size=4)

    # VLM jsonl + image dir
    vlm_dir = root / "vlm"
    vlm_dir.mkdir()
    (vlm_dir / "images").mkdir()
    lines = []
    for i in range(6):
        name = f"img{i}.png"
        _rand_image(rng, 56, 42).save(vlm_dir / "images" / name)
        lines.append(json.dumps({
            "image": name,
            "conversations": [
                {"from": "human", "value": f"<image>\nwhat is {i}?"},
                {"from": "gpt", "value": f"it is the number {i}"},
            ],
        }))
    (vlm_dir / "conv.jsonl").write_text("\n".join(lines))

    # edit parquet: {image_list: [bytes], instruction_list: [[str]]}
    edit_dir = root / "edit"
    edit_dir.mkdir()
    rows = []
    for i in range(4):
        imgs = []
        for j in range(3):
            buf = io.BytesIO()
            _rand_image(rng, 48, 48).save(buf, "PNG")
            imgs.append(buf.getvalue())
        rows.append({
            "image_list": imgs,
            "instruction_list": [[f"make it {j}" for j in range(2)]] * 2,
        })
    pq.write_table(pa.Table.from_pylist(rows), edit_dir / "part0.parquet",
                   row_group_size=2)
    return root


@pytest.fixture(scope="module")
def pieces(corpora):
    cfg = micro_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    # strides follow the micro config: vit patch 14, vae downsample 4
    vae_tf = ImageTransform(64, 16, cfg.latent_downsample, max_pixels=64 * 64)
    vit_tf = ImageTransform(56, 28, cfg.vit.patch_size, max_pixels=56 * 56)
    pcfg = PackerConfig(
        vae_image_downsample=cfg.latent_downsample,
        max_latent_size=cfg.max_latent_size,
        vit_patch_size=cfg.vit.patch_size,
        max_num_patch_per_side=cfg.vit_max_num_patch_per_side,
    )
    return cfg, tok, vae_tf, vit_tf, pcfg


def test_t2i_dataset_and_packer(corpora, pieces):
    cfg, tok, vae_tf, vit_tf, pcfg = pieces
    ds = T2IIterableDataset(
        "t2i_pretrain", vae_tf, tok, [str(corpora / "t2i")], [1]
    )
    it = iter(ds)
    sample = next(it)
    assert sample["sequence_plan"][0]["type"] == "text"
    assert sample["sequence_plan"][1]["loss"] == 1
    assert sample["image_tensor_list"][0].shape[0] % cfg.latent_downsample == 0

    builder = SequenceBuilder(pcfg, tok.new_token_ids)
    builder.pack_sample(sample)
    assert builder.curr == sum(sp[3] for sp in builder.spans)
    # text split causal, vae split is 'noise' (loss image)
    assert max(sp[2] for sp in builder.spans) >= 0

    host = finalize(
        builder, seq_bucket=128, vit_patch_dim=cfg.vit.patch_dim,
        patch_latent_dim=cfg.patch_latent_dim,
    )
    assert host.batch.position_ids.shape[0] % 128 == 0
    assert len(host.vae_images) == 1


def test_vlm_dataset(corpora, pieces):
    cfg, tok, vae_tf, vit_tf, pcfg = pieces
    ds = SftJSONLIterableDataset(
        "vlm_sft", vit_tf, tok,
        [str(corpora / "vlm" / "conv.jsonl")],
        [str(corpora / "vlm" / "images")],
    )
    sample = next(iter(ds))
    types = [p["type"] for p in sample["sequence_plan"]]
    assert "vit_image" in types and "text" in types
    assert any(p["loss"] for p in sample["sequence_plan"])


def test_edit_dataset(corpora, pieces):
    cfg, tok, vae_tf, vit_tf, pcfg = pieces
    ds = UnifiedEditIterableDataset(
        "unified_edit", vae_tf, tok, vit_tf,
        [str(corpora / "edit")],
    )
    sample = next(iter(ds))
    types = [p["type"] for p in sample["sequence_plan"]]
    assert types.count("vae_image") >= 2  # source context + target loss
    assert "vit_image" in types


def test_full_pipeline_to_train_step(corpora, pieces):
    cfg, tok, vae_tf, vit_tf, pcfg = pieces
    t2i = T2IIterableDataset(
        "t2i_pretrain", vae_tf, tok, [str(corpora / "t2i")], [1]
    )
    vlm = SftJSONLIterableDataset(
        "vlm_sft", vit_tf, tok,
        [str(corpora / "vlm" / "conv.jsonl")],
        [str(corpora / "vlm" / "images")],
    )
    packer = PackedBatchIterator(
        pcfg, [iter(t2i), iter(vlm)], weights=[0.5, 0.5],
        is_mandatory=[True, False], special_tokens=tok.new_token_ids,
        expected_num_tokens=300, max_num_tokens_per_sample=280,
        max_num_tokens=400,
        finalize_kwargs=dict(
            seq_bucket=512, vit_patch_dim=cfg.vit.patch_dim,
            patch_latent_dim=cfg.patch_latent_dim,
        ),
    )
    host = next(iter(packer))
    assert host.batch.position_ids.shape[0] == 512
    assert host.data_indexes  # resume bookkeeping present

    params = init_bagel_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = encode_vae_images(params["vae"], cfg, host, jax.random.PRNGKey(1))
    import jax as _jax

    bb = _jax.tree.map(lambda x: x[None], batch)  # add batch axis
    n_vae = bb.vae_patches.shape[1]
    loss, metrics = compute_losses(
        params, cfg, bb,
        jnp.zeros((1, n_vae, cfg.patch_latent_dim)),
        ce_weight=1.0, mse_weight=1.0,
    )
    assert np.isfinite(float(loss))
    assert float(metrics["ce_tokens"]) > 0
    assert float(metrics["mse_tokens"]) > 0


def _reference_edit_plan(n_frames, n_variants, seed):
    """Oracle: the reference's UnifiedEditIterableDataset.parse_row decision
    procedure (edit_dataset.py:21-73), reduced to its observable plan —
    (kind, detail) events in global-`random` draw order."""
    import random as _r

    _r.seed(seed)
    start_idx = _r.choice(range(n_frames - 1))
    end_idx = _r.choice(range(start_idx + 1, min(start_idx + 3, n_frames)))
    events = [("image", start_idx, dict(loss=0, vae=1, vit=1))]
    if end_idx - start_idx > 1 and _r.random() < 0.5:
        if end_idx == n_frames - 1:
            end_idx -= 1
        instruction = ""
        for idx in range(start_idx + 1, end_idx + 1):
            instruction += f"i{idx - 1}v{_r.choice(range(n_variants))}" + ". "
        events.append(("text", instruction.rstrip()))
        events.append(("image", end_idx, dict(loss=1, vae=0, vit=0)))
    else:
        for idx in range(start_idx + 1, end_idx + 1):
            events.append(("text", f"i{idx - 1}v{_r.choice(range(n_variants))}"))
            last = idx == end_idx
            events.append(
                ("image", idx, dict(loss=1, vae=int(not last), vit=int(not last)))
            )
    return events


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_edit_parse_row_plan_parity(corpora, pieces, seed):
    """Seeded parse_row plans match the reference decision procedure exactly
    (the rewrite must preserve the training data distribution)."""
    import random as _r

    cfg, tok, vae_tf, vit_tf, pcfg = pieces
    ds = UnifiedEditIterableDataset(
        "unified_edit", vae_tf, tok, vit_tf, [str(corpora / "edit")]
    )
    # synthetic chain: 4 frames, instruction text encodes (hop, variant) so
    # the oracle can predict the drawn string
    n_frames, n_variants = 4, 3
    rng = np.random.default_rng(9)
    frames = []
    for _ in range(n_frames):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8), "RGB"
        ).save(buf, "PNG")
        frames.append(buf.getvalue())
    row = {
        "image_list": frames,
        "instruction_list": [
            [f"i{h}v{v}" for v in range(n_variants)]
            for h in range(n_frames - 1)
        ],
    }

    _r.seed(seed)
    data = ds.parse_row(row)
    expected = _reference_edit_plan(n_frames, n_variants, seed)

    # flatten the produced plan back into oracle events
    got = []
    text_i = 0
    plan = list(data["sequence_plan"])
    k = 0
    while k < len(plan):
        p = plan[k]
        if p["type"] == "text":
            got.append(("text", tuple(data["text_ids_list"][text_i])))
            text_i += 1
            k += 1
            continue
        # image entries come in (loss?)(vae ctx?)(vit?) order from _add_image
        flags = dict(loss=0, vae=0, vit=0)
        while k < len(plan) and plan[k]["type"] in ("vae_image", "vit_image"):
            q = plan[k]
            if q["type"] == "vae_image" and q["loss"] == 1:
                flags["loss"] = 1
            elif q["type"] == "vae_image":
                flags["vae"] = 1
            else:
                flags["vit"] = 1
            k += 1
        got.append(("image", flags))

    exp_simplified = []
    for ev in expected:
        if ev[0] == "text":
            exp_simplified.append(("text", tuple(tok.encode(ev[1]))))
        else:
            exp_simplified.append(("image", ev[2]))
    assert got == exp_simplified, f"seed {seed}: {got} != {exp_simplified}"


def test_vlm_elements_parity():
    """_elements matches the reference change_format (vlm_dataset.py:68-95)
    on placeholder-heavy conversations."""
    from bagel_tpu.data.datasets import SftJSONLIterableDataset

    ds = SftJSONLIterableDataset.__new__(SftJSONLIterableDataset)
    conv = {
        "conversations": [
            {"from": "human", "value": "look <image> and <image> closely"},
            {"from": "gpt", "value": "  I see.  "},
            {"from": "human", "value": "no images here"},
            {"from": "human", "value": "<image>leading"},
        ]
    }
    # num_images budget of 2: third placeholder (index >= 2) is dropped
    els = ds._elements(conv, num_images=2)
    assert els == [
        {"type": "text", "has_loss": 0, "text": "look"},
        {"type": "image"},
        {"type": "text", "has_loss": 0, "text": "and"},
        {"type": "image"},
        {"type": "text", "has_loss": 0, "text": "closely"},
        {"type": "text", "has_loss": 1, "text": "  I see.  "},  # gpt verbatim
        {"type": "text", "has_loss": 0, "text": "no images here"},
        {"type": "image"},  # boundary index 0 < budget
        {"type": "text", "has_loss": 0, "text": "leading"},
    ]
