"""Golden tests: losses vs the torch reference implementations."""
import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from atmvfi_tpu import losses


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_lap():
    return _load_ref("ref_lap", "/root/reference/loss_fn/laplacian_pyramid_loss.py")


@pytest.fixture(scope="module")
def ref_census():
    return _load_ref("ref_census", "/root/reference/loss_fn/census_loss.py")


@pytest.fixture(scope="module")
def ref_sobel():
    return _load_ref("ref_sobel", "/root/reference/loss_fn/edge_loss.py")


def _pair(seed, shape=(2, 32, 48, 3)):
    rng = np.random.default_rng(seed)
    a = rng.random(shape, dtype=np.float32)
    b = rng.random(shape, dtype=np.float32)
    return a, b


def _t(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()


@pytest.mark.parametrize("levels", [2, 5])
def test_lap_loss_matches(ref_lap, levels):
    a, b = _pair(0, shape=(2, 64, 96, 3))
    crit = ref_lap.LapLoss(max_levels=levels)
    want = crit(_t(a), _t(b)).item()
    got = float(losses.lap_loss(jnp.asarray(a), jnp.asarray(b), max_levels=levels))
    assert abs(got - want) < 1e-5


def test_census_loss_matches(ref_census):
    a, b = _pair(1)
    crit = ref_census.Ternary(device=torch.device("cpu"))
    want = crit(_t(a), _t(b)).item()
    got = float(losses.census_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-5


def test_sobel_loss_matches(ref_sobel):
    import jax

    a, b = _pair(2)
    crit = ref_sobel.SobelLoss()
    want = crit(_t(a), _t(b)).item()
    with jax.default_matmul_precision("highest"):
        got = float(losses.sobel_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-5


def test_charbonnier_matches():
    a, b = _pair(3)
    want = torch.mean(torch.sqrt((_t(a) - _t(b)).pow(2) + 1e-6)).item()
    got = float(losses.charbonnier_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-6


def test_pose_loss_disabled_returns_zero():
    loss = losses.PoseLoss()
    assert not loss.available
    a, b = _pair(4)
    assert float(loss(a, b)) == 0.0


# ----------------------------------------------------------------------
# VGG perceptual + style (random-weight torch replica of
# torchvision vgg16.features[:23] — torchvision absent in this env)
# ----------------------------------------------------------------------

_VGG_CFG = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
            (128, 256), (256, 256), (256, 256), "M",
            (256, 512), (512, 512), (512, 512)]


@pytest.fixture(scope="module")
def torch_vgg16_random(tmp_path_factory):
    """Plain-torch vgg16.features[:23] with random weights + npz export."""
    torch.manual_seed(3)
    layers = []
    for spec in _VGG_CFG:
        if spec == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            cin, cout = spec
            layers.append(torch.nn.Conv2d(cin, cout, 3, padding=1))
            layers.append(torch.nn.ReLU())
    features = torch.nn.Sequential(*layers).eval()
    # same block splits as vgg_loss.py:177-180
    blocks = [features[:4], features[4:9], features[9:16], features[16:23]]

    # export in the losses.vgg npz layout
    from atmvfi_tpu.losses.vgg import _VGG16_PLAN

    names = [p[0] for p in _VGG16_PLAN if isinstance(p, tuple)]
    arrays, ci = {}, 0
    for layer in features:
        if isinstance(layer, torch.nn.Conv2d):
            n = names[ci]
            arrays[f"{n}.kernel"] = (
                layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            )
            arrays[f"{n}.bias"] = layer.bias.detach().numpy()
            ci += 1
    path = tmp_path_factory.mktemp("vgg") / "vgg16_random.npz"
    np.savez(path, **arrays)
    return blocks, str(path)


def _ref_vgg_perceptual(blocks, pred, target):
    """Verbatim math of VGGPerceptualLoss.forward (vgg_loss.py:202-229)."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = (pred - mean) / std
    y = ((target - mean) / std).detach()
    perceptual, style = 0.0, 0.0
    for block in blocks:
        x = block(x)
        y = block(y)
        perceptual = perceptual + torch.nn.functional.l1_loss(x, y)
        ax = x.reshape(x.shape[0], x.shape[1], -1)
        ay = y.reshape(y.shape[0], y.shape[1], -1)
        gx = ax @ ax.permute(0, 2, 1)
        gy = ay @ ay.permute(0, 2, 1)
        style = style + torch.nn.functional.mse_loss(gx, gy)
    return float(perceptual), float(style)


def test_vgg_perceptual_style_matches(torch_vgg16_random):
    from atmvfi_tpu.losses.vgg import VGGPerceptualLoss

    blocks, npz_path = torch_vgg16_random
    rng = np.random.default_rng(11)
    pred = rng.random((2, 64, 64, 3), dtype=np.float32)
    target = rng.random((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want_p, want_s = _ref_vgg_perceptual(
            blocks, _t(pred), _t(target)
        )
    loss = VGGPerceptualLoss(npz_path)
    import jax

    with jax.default_matmul_precision("highest"):
        got_p, got_s = jax.jit(loss)(jnp.asarray(pred), jnp.asarray(target))
    assert abs(float(got_p) - want_p) < 5e-4 * max(1.0, abs(want_p))
    assert abs(float(got_s) - want_s) < 5e-3 * max(1.0, abs(want_s))


# ----------------------------------------------------------------------
# pose loss math (reference imports ultralytics/ViTPose at module top,
# so the math is replicated here verbatim from loss_fn/pose_loss.py)
# ----------------------------------------------------------------------

def _ref_pose_mask(heatmaps, threshold=0.9, kp_threshold=1.2):
    """get_mask (pose_loss.py:203-225), verbatim loops."""
    B, _, H, W = heatmaps.size()
    mask = torch.zeros(B, 1, H, W)
    for i in range(B):
        heatmap = heatmaps[None, i].clone()
        a, _ = torch.max(heatmap.clone().view(1, 17, -1), dim=2)
        heatmap, cls_logit = torch.max(heatmap, dim=1)
        valid = [j for j in range(17) if a[0, j] > kp_threshold]
        invalid = [j for j in range(17) if a[0, j] <= kp_threshold]
        for label in valid:
            heatmap[cls_logit == label] = torch.where(
                heatmap[cls_logit == label] < threshold * a[0, label], 0.0, 1.0
            )
        for label in invalid:
            heatmap[cls_logit == label] = 0.0
        mask[i, :] = heatmap
    return mask.squeeze(1)


def _heatmap_pair(seed, n=3, k=17, h=16, w=12):
    rng = np.random.default_rng(seed)
    pred = (rng.standard_normal((n, k, h, w)) * 1.5).astype(np.float32)
    gt = (rng.standard_normal((n, k, h, w)) * 1.5).astype(np.float32)
    return pred, gt


def test_pose_ce_matches_reference_forward1():
    from atmvfi_tpu.losses.pose import heatmap_ce_loss

    pred, gt = _heatmap_pair(5)
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
    label = tg.argmax(dim=1)
    ce = torch.nn.CrossEntropyLoss(reduction="none")(tp, label)
    want = float(torch.mean(ce * _ref_pose_mask(tg)))
    got = float(heatmap_ce_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert abs(got - want) < 1e-5


def test_pose_kl_matches_reference_forward2():
    from atmvfi_tpu.losses.pose import heatmap_kl_loss

    pred, gt = _heatmap_pair(6)
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
    want = float(torch.nn.functional.kl_div(
        torch.nn.functional.log_softmax(tp, dim=1),
        torch.nn.functional.softmax(tg, dim=1),
        log_target=False,
    ))
    got = float(heatmap_kl_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert abs(got - want) < 1e-6


def _ref_pad_image(image, aspect_ratio):
    """pad_image (pose_loss.py:52-82), verbatim."""
    _, _, image_height, image_width = image.size()
    if image_width / image_height < aspect_ratio:
        target_width = int(aspect_ratio * image_height)
        pad_width = target_width - image_width
        left_pad = pad_width // 2
        return torch.nn.functional.pad(
            image, pad=(left_pad, pad_width - left_pad, 0, 0)
        )
    target_height = int(image_width / aspect_ratio)
    pad_height = target_height - image_height
    top_pad = pad_height // 2
    return torch.nn.functional.pad(
        image, pad=(0, 0, top_pad, pad_height - top_pad)
    )


def test_pose_box_processing_matches():
    from atmvfi_tpu.losses.pose import process_boxes

    raw = np.array([
        [10.4, 20.6, 100.5, 180.2, 0.9, 0],   # kept (rounded, padded)
        [5.0, 5.0, 50.0, 50.0, 0.2, 0],       # conf below 0.35
        [5.0, 5.0, 50.0, 50.0, 0.8, 1],       # not a person
        [2.0, 3.0, 60.0, 90.0, 0.5, 0],       # kept, pad clamps at 0
    ], np.float32)
    got = process_boxes(raw, H=200, W=160)
    # reference: round().long(); coords +(-10, 10); clamp to (0, W/H)
    t = torch.from_numpy(raw)
    keep = [0, 3]
    tr = torch.round(t[keep]).long()
    tr[:, [0, 2]] = torch.clamp(tr[:, [0, 2]] + torch.tensor([-10, 10]), 0, 160)
    tr[:, [1, 3]] = torch.clamp(tr[:, [1, 3]] + torch.tensor([-10, 10]), 0, 200)
    np.testing.assert_array_equal(got[:, :4], tr.numpy()[:, :4])


def test_pose_crop_pipeline_matches():
    """prepare_crops vs normalize->crop->pad_image->interpolate
    (get_cropped_img, pose_loss.py:113-133)."""
    from atmvfi_tpu.losses.pose import prepare_crops

    rng = np.random.default_rng(9)
    img = rng.random((1, 120, 160, 3), dtype=np.float32)
    boxes = [np.array([[20, 10, 100, 110, 1, 0]])]  # tall crop -> pad width
    got = prepare_crops(img, boxes)
    assert got.shape == (1, 256, 192, 3)

    timg = _t(img)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    timg = (timg - mean) / std
    crop = timg[:, :, 10:110, 20:100]
    padded = _ref_pad_image(crop, 3 / 4)
    want = torch.nn.functional.interpolate(
        padded, size=(256, 192), mode="bilinear", align_corners=True
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=1e-4)
