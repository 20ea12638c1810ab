"""Numerical parity: flax OCR det/rec vs the reference torch networks.

Same random weights (torch init -> converted), same input -> outputs must
match element-wise. This is the test layer the reference lacks (SURVEY.md §4).
"""
import numpy as np
import pytest

import refnets

torch = pytest.importorskip("torch")

if not refnets.available():  # pragma: no cover
    pytest.skip("reference networks unavailable", allow_module_level=True)


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.fixture(scope="module")
def torch_det():
    m = refnets.load("backbones.rec_lcnetv4")
    fpnm = refnets.load("necks.db_fpn")
    headm = refnets.load("heads.det_db_head")
    torch.manual_seed(0)

    class Det(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = m.PPLCNetV4(det=True, model_size="small")
            self.neck = fpnm.RepLKFPN(
                in_channels=self.backbone.out_channels,
                out_channels=96,
                dilated_kernel_size=7,
                shortcut=True,
            )
            self.head = headm.DBHead(
                in_channels=96, k=50, mode="ppocrv6", fix_nan=True,
                kernel_list=[3, 2, 2],
            )

        def forward(self, x):
            return self.head(self.neck(self.backbone(x)))["maps"]

    return Det().eval()


def test_det_parity(torch_det):
    import jax.numpy as jnp

    from rapiddoc_tpu.models.ocr.convert import det_variables_from_torch
    from rapiddoc_tpu.models.ocr.det import DBNet

    x = torch.randn(2, 3, 96, 128)
    with torch.no_grad():
        ref = torch_det(x).numpy()  # (B,1,H,W)
    variables = det_variables_from_torch(torch_det.state_dict())
    model = DBNet()
    out = model.apply(variables, jnp.asarray(_to_nhwc(x)))  # (B,H,W,1)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def torch_rec():
    m = refnets.load("backbones.rec_lcnetv4")
    headm = refnets.load("heads.rec_multi_head")
    torch.manual_seed(1)

    class Rec(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = m.PPLCNetV4(det=False, model_size="small")
            self.head = headm.MultiHead(
                in_channels=384,
                out_channels_list={"CTCLabelDecode": 201},
                head_list=[
                    {
                        "CTCHead": {
                            "Neck": {
                                "name": "lightsvtr",
                                "dims": 120,
                                "depth": 2,
                                "mlp_ratio": 2.0,
                                "local_kernel": 7,
                            },
                            "Head": {"fc_decay": 1e-5},
                        }
                    },
                    {"NRTRHead": {"nrtr_dim": 384, "max_text_length": 25}},
                ],
            )

        def forward(self, x):
            out = self.head(self.backbone(x))
            return out["ctc_logits"] if isinstance(out, dict) else out

    return Rec().eval()


def test_rec_parity(torch_rec):
    import jax.numpy as jnp

    from rapiddoc_tpu.models.ocr.convert import rec_variables_from_torch
    from rapiddoc_tpu.models.ocr.rec import SVTRRec

    x = torch.randn(2, 3, 48, 160)
    with torch.no_grad():
        ref = torch_rec(x).numpy()  # (B, T, classes)
    variables = rec_variables_from_torch(torch_rec.state_dict())
    model = SVTRRec(num_classes=201)
    out = np.asarray(model.apply(variables, jnp.asarray(_to_nhwc(x))))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)
