"""torchvision ViT-B/16 backbone: state-dict import + forward parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
torchvision = pytest.importorskip("torchvision")

from image2text_tpu.models.vit import (
    VisionTransformerB16,
    import_torchvision_vit_state_dict,
)

KEY = jax.random.PRNGKey(0)


def test_vit_b16_import_parity():
    """A tiny torchvision VisionTransformer (random weights, offline) maps
    1:1 onto our tree and produces identical pooled CLS features
    (reference backbone: models/encoder.py:56-61)."""
    from torchvision.models.vision_transformer import VisionTransformer

    tv = VisionTransformer(image_size=32, patch_size=8, num_layers=2,
                           num_heads=2, hidden_dim=32, mlp_dim=64)
    tv.heads = torch.nn.Identity()  # reference replaces heads (encoder.py:61)
    tv.eval()

    ours = VisionTransformerB16(image_size=32, patch_size=8, num_layers=2,
                                num_heads=2, hidden_dim=32, mlp_dim=64)
    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    params = import_torchvision_vit_state_dict(ours.init(KEY), sd)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.tensor(img)).numpy()
    out = np.asarray(ours(params, jnp.asarray(img)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_vit_import_rejects_unknown_keys():
    ours = VisionTransformerB16(image_size=32, patch_size=8, num_layers=1,
                                num_heads=2, hidden_dim=32, mlp_dim=64)
    params = ours.init(KEY)
    with pytest.raises(KeyError):
        import_torchvision_vit_state_dict(params, {"nope.weight":
                                                   np.zeros((1,))})
