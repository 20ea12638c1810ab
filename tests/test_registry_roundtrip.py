"""Checkpoint save/load roundtrip through the npz registry format."""
import numpy as np
import pytest


def test_npz_roundtrip_preserves_tree(tmp_path):
    from rapiddoc_tpu.models.registry import _load_variables, save_variables

    tree = {
        "params": {
            "layer1": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)},
            "nested": {"deep": {"bias": np.ones(5, np.float32)}},
        },
        "batch_stats": {"bn": {"mean": np.zeros(4, np.float32)}},
    }
    path = tmp_path / "m.npz"
    save_variables(tree, path)
    loaded = _load_variables(path)
    np.testing.assert_array_equal(
        loaded["params"]["layer1"]["kernel"], tree["params"]["layer1"]["kernel"]
    )
    np.testing.assert_array_equal(
        loaded["params"]["nested"]["deep"]["bias"],
        tree["params"]["nested"]["deep"]["bias"],
    )
    assert "batch_stats" in loaded


def test_converted_det_roundtrips_through_npz(tmp_path):
    """Torch det state -> flax vars -> npz -> load -> same outputs."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "tests")
    import refnets

    if not refnets.available():
        pytest.skip("reference unavailable")
    import jax.numpy as jnp

    from rapiddoc_tpu.models.ocr.convert import det_variables_from_torch
    from rapiddoc_tpu.models.ocr.det import DBNet
    from rapiddoc_tpu.models.registry import _load_variables, save_variables

    m = refnets.load("backbones.rec_lcnetv4")
    fpnm = refnets.load("necks.db_fpn")
    headm = refnets.load("heads.det_db_head")
    torch.manual_seed(3)

    class Det(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = m.PPLCNetV4(det=True, model_size="small")
            self.neck = fpnm.RepLKFPN(
                in_channels=self.backbone.out_channels, out_channels=96,
                dilated_kernel_size=7, shortcut=True,
            )
            self.head = headm.DBHead(
                in_channels=96, k=50, mode="ppocrv6", fix_nan=True,
                kernel_list=[3, 2, 2],
            )

        def forward(self, x):
            return self.head(self.neck(self.backbone(x)))["maps"]

    det = Det().eval()
    variables = det_variables_from_torch(det.state_dict())
    path = tmp_path / "det.npz"
    save_variables(variables, path)
    loaded = _load_variables(path)

    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    model = DBNet()
    a = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    b = model.apply(loaded, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lang_detection():
    from rapiddoc_tpu.utils.lang import detect_lang, guess_suffix_by_bytes

    assert detect_lang("这是一个中文文档的内容示例，包含很多汉字。") == "ch"
    assert detect_lang("This is clearly an English document sample.") == "en"
    # cyrillic now refines to a concrete language (utils/langid.py)
    assert detect_lang("Это русский текст документа") == "ru"
    assert detect_lang("한국어 문서 내용입니다") == "korean"
    # Latin-script discrimination via stopword/diacritic profiles
    # (lid.176 role for the languages script ranges cannot separate)
    assert detect_lang(
        "Les résultats de l'expérience sont présentés dans le tableau "
        "et sont cohérents avec les travaux."
    ) == "fr"
    assert detect_lang(
        "Die Ergebnisse der Untersuchung sind in der Tabelle dargestellt "
        "und stimmen mit früheren Arbeiten überein."
    ) == "de"
    assert detect_lang(
        "Los resultados del experimento se muestran en la tabla y son "
        "consistentes con el trabajo anterior."
    ) == "es"
    assert detect_lang(
        "Os resultados do experimento são mostrados na tabela e são "
        "consistentes com o trabalho anterior."
    ) == "pt"
    assert guess_suffix_by_bytes(b"%PDF-1.7\n...") == "pdf"
    assert guess_suffix_by_bytes(b"\x89PNG\r\n\x1a\n") == "png"
    assert guess_suffix_by_bytes(b"hello plain text") == "txt"


def test_do_parse_helper(tmp_path):
    import os

    os.environ.setdefault("RAPIDDOC_DISABLE_OCR", "1")
    from PIL import Image, ImageDraw

    from rapiddoc_tpu import pdfio
    from rapiddoc_tpu.cli.common import do_parse

    img = Image.new("RGB", (300, 200), "white")
    ImageDraw.Draw(img).text((40, 90), "batch helper", fill="black")
    pdf = pdfio.images_to_pdf([img])
    results = do_parse(
        tmp_path, ["docA"], [pdf], parse_method="txt",
        formula_enable=False, table_enable=False,
    )
    assert len(results) == 1
    assert (tmp_path / "docA" / "docA.md").exists()


def test_custom_model_contract():
    from rapiddoc_tpu.models.custom import CustomBaseModel, resolve_custom

    class MyFormula(CustomBaseModel):
        def batch_predict(self, images):
            return ["x^2"] * len(images)

    model = resolve_custom({"custom_model": MyFormula()}, "formula")
    assert model.batch_predict([None, None]) == ["x^2", "x^2"]
    with pytest.raises(TypeError):
        resolve_custom({"custom_model": object()}, "formula")
    assert resolve_custom({}, "formula") is None
