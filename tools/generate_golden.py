"""Generate golden parity fixtures by executing the reference implementation.

Runs the PyTorch reference (mounted read-only at /root/reference) on
deterministic random inputs and saves its outputs as .npz fixtures under
tests/fixtures/.  The fixtures are committed; tests compare the JAX
framework against them without needing the reference at test time.

Usage:  python tools/generate_golden.py
"""

import os
import sys
import types

import numpy as np
import torch

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
os.makedirs(OUT, exist_ok=True)

# ---- stub modules the reference imports but this image lacks -------------
def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _FakeCh:
    """Minimal chumpy.Ch stand-in: unpickles to expose the wrapped array."""

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})

    def __array__(self, dtype=None):
        x = np.asarray(self.__dict__.get("x"))
        return x.astype(dtype) if dtype is not None else x


class _FakeSelect(_FakeCh):
    """chumpy.reordering.Select: a.ravel()[idxs] reshaped."""

    def __array__(self, dtype=None):
        a = np.asarray(self.__dict__["a"])
        x = a.ravel()[np.asarray(self.__dict__["idxs"])]
        shape = self.__dict__.get("preferred_shape")
        if shape is not None:
            x = x.reshape(shape)
        return x.astype(dtype) if dtype is not None else x


chp = _stub("chumpy", Ch=_FakeCh)
chp.__path__ = []
_stub("chumpy.ch", Ch=_FakeCh)
_stub("chumpy.reordering", Select=_FakeSelect)
_stub("mano")
_stub("mano.utils", Mesh=object)
tv = _stub("torchvision")
tv_t = _stub("torchvision.transforms", Resize=object)
_stub("torchvision.transforms.functional")
_stub("torchvision.models")
_stub("pycocotools")
_stub("pycocotools.coco", COCO=object)
_stub("scipy.io", loadmat=None) if "scipy.io" not in sys.modules else None

sys.path.insert(0, REF)

rng = np.random.default_rng(42)


def save(name, **arrays):
    np.savez_compressed(os.path.join(OUT, name + ".npz"), **arrays)
    print("wrote", name, {k: v.shape for k, v in arrays.items()})


# ---- canonical_trafo -----------------------------------------------------
from utils.canonical_trafo import canonical_trafo, flip_right_hand  # noqa: E402

coords = rng.normal(size=(8, 21, 3)).astype(np.float32)
normed, rot = canonical_trafo(torch.tensor(coords))
cond = rng.integers(0, 2, size=(8, 1)).astype(bool)
flipped = flip_right_hand(normed, torch.tensor(cond))
save("canonical", coords=coords, normed=normed.numpy(), rot=rot.numpy(),
     cond=cond, flipped=flipped.numpy())

# ---- bone_rel_trafo ------------------------------------------------------
from utils.relative_trafo import bone_rel_trafo, bone_rel_trafo_inv  # noqa: E402

rel_in = rng.normal(size=(8, 21, 3)).astype(np.float32)
rel = bone_rel_trafo(torch.tensor(rel_in))
back = bone_rel_trafo_inv(rel)
save("bone_rel", coords=rel_in, rel=rel.numpy(), back=back.numpy())

# ---- projection ----------------------------------------------------------
from utils.coordinate_trans import batch_project_xyz_to_uv, camera_xyz_to_uv  # noqa: E402

xyz = (rng.normal(size=(8, 21, 3)) * 0.2 + np.array([0, 0, 0.8])).astype(np.float32)
K = np.tile(np.array([[320., 0., 160.], [0., 320., 160.], [0., 0., 1.]],
                     dtype=np.float32), (8, 1, 1))
K += rng.normal(size=K.shape).astype(np.float32) * np.array(
    [[5., 0., 2.], [0., 5., 2.], [0., 0., 0.]], dtype=np.float32)
uv = batch_project_xyz_to_uv(torch.tensor(xyz), torch.tensor(K))
uv_single = camera_xyz_to_uv(torch.tensor(xyz[0]), torch.tensor(K[0]))
save("projection", xyz=xyz, K=K, uv=uv.numpy(), uv_single=uv_single.numpy())

# ---- axis-angle / euler rotations ---------------------------------------
from utils.general import _get_rot_mat  # noqa: E402
from network.sub_modules.forwardKinematicsLayer import (  # noqa: E402
    get_right_hand_batch_rotation_matrix, ForwardKinematics)

u = (rng.normal(size=(16, 3)) * 1.5).astype(np.float32)
R_aa = _get_rot_mat(torch.tensor(u[:, 0:1]), torch.tensor(u[:, 1:2]),
                    torch.tensor(u[:, 2:3]))
angles = (rng.normal(size=(16, 3))).astype(np.float32)
R_euler = get_right_hand_batch_rotation_matrix(torch.tensor(angles))
save("rotations", u=u, R_aa=R_aa.numpy(), angles=angles,
     R_euler=R_euler.numpy())

# ---- forward kinematics --------------------------------------------------
import config.config as refcfg  # noqa: E402

B = 4
root_angles = rng.normal(size=(B, 3)).astype(np.float32)
other_angles = rng.normal(size=(B, 23)).astype(np.float32)
bone_lengths = (rng.uniform(0.2, 1.0, size=(B, 20))).astype(np.float32)
Kb = K[:B]
scale = rng.uniform(0.03, 0.06, size=(B, 1)).astype(np.float32)
root = (rng.normal(size=(B, 3)) * 0.1 + np.array([0, 0, 0.7])).astype(np.float32)

fk = ForwardKinematics()
refcfg.joint_order_switched = True
xyz_ns, uv_ns, _ = fk(torch.tensor(root_angles), torch.tensor(other_angles),
                      torch.tensor(bone_lengths), torch.tensor(Kb),
                      torch.tensor(scale), torch.tensor(root))
refcfg.joint_order_switched = False
xyz_sw, uv_sw, _ = fk(torch.tensor(root_angles), torch.tensor(other_angles),
                      torch.tensor(bone_lengths), torch.tensor(Kb),
                      torch.tensor(scale), torch.tensor(root))
refcfg.joint_order_switched = True
save("fk", root_angles=root_angles, other_angles=other_angles,
     bone_lengths=bone_lengths, K=Kb, scale=scale, root=root,
     xyz_noswitch=xyz_ns.detach().numpy(), uv_noswitch=uv_ns.detach().numpy(),
     xyz_switch=xyz_sw.detach().numpy(), uv_switch=uv_sw.detach().numpy())

# ---- MANO layer ----------------------------------------------------------
from network.sub_modules.MANOLayer import ManoLayer  # noqa: E402

mano_pkl = os.path.join(REF, "config/mano/models/MANO_RIGHT.pkl")
for pose_num in (6, 10, 45):
    layer = ManoLayer("cpu", mano_pkl, pose_num=pose_num)
    Bm = 4
    rots = (rng.normal(size=(Bm, 3)) * 1.0).astype(np.float32)
    poses = (rng.normal(size=(Bm, pose_num)) * 1.0).astype(np.float32)
    betas = (rng.normal(size=(Bm, 10)) * 0.3).astype(np.float32)
    verts, joints = layer(torch.tensor(rots), torch.tensor(poses),
                          torch.tensor(betas))
    save(f"mano_p{pose_num}", rots=rots, poses=poses, betas=betas,
         verts=verts.detach().numpy(), joints=joints.detach().numpy())

# ---- scoremap ------------------------------------------------------------
from dataloader.RHD.dataloaderRHD import RHD_HandKeypointsDataset  # noqa: E402

coords_hw = (rng.uniform(-10, 266, size=(6, 21, 2))).astype(np.float32)
vis = rng.integers(0, 2, size=(6, 21, 1)).astype(np.float32)
maps = []
for i in range(6):
    m = RHD_HandKeypointsDataset.create_multiple_gaussian_map(
        torch.tensor(coords_hw[i]), (256, 256), 25.0,
        valid_vec=torch.tensor(vis[i]))
    maps.append(m.permute(2, 0, 1).numpy())
save("scoremap", coords_hw=coords_hw, vis=vis,
     maps=np.stack(maps).astype(np.float32))

# ---- losses / metric -----------------------------------------------------
from criterions.loss import LossCalculation  # noqa: E402
from criterions.metrics import MPJPE  # noqa: E402

pre_xyz = rng.normal(size=(4, 21, 3)).astype(np.float32)
gt_xyz = rng.normal(size=(4, 21, 3)).astype(np.float32)
pre_uv = (rng.uniform(0, 256, size=(4, 21, 2))).astype(np.float32)
gt_uv = (rng.uniform(0, 256, size=(4, 21, 2))).astype(np.float32)
vis2 = rng.integers(0, 2, size=(4, 21, 1)).astype(np.float32)
hand_mask = rng.integers(0, 2, size=(4, 256, 256)).astype(np.float32)
theta = rng.normal(size=(4, 10)).astype(np.float32)
beta = rng.normal(size=(4, 10)).astype(np.float32)

crit = LossCalculation(comp_xyz_loss=True, comp_uv_loss=True,
                       comp_hand_mask_loss=True, comp_regularization_loss=True)
lx, luv, _, lhm, lreg = crit(torch.tensor(pre_xyz), torch.tensor(gt_xyz),
                             torch.tensor(pre_uv), torch.tensor(gt_uv),
                             torch.tensor(vis2),
                             hand_mask=torch.tensor(hand_mask),
                             theta=torch.tensor(theta), beta=torch.tensor(beta))
mp = MPJPE()(torch.tensor(pre_xyz), torch.tensor(gt_xyz), torch.tensor(vis2))
# all-invisible guard case
mp0 = MPJPE()(torch.tensor(pre_xyz), torch.tensor(gt_xyz),
              torch.tensor(np.zeros_like(vis2)))
save("losses", pre_xyz=pre_xyz, gt_xyz=gt_xyz, pre_uv=pre_uv, gt_uv=gt_uv,
     vis=vis2, hand_mask=hand_mask, theta=theta, beta=beta,
     loss_xyz=np.float32(lx.item()), loss_uv=np.float32(luv.item()),
     loss_hand_mask=np.float32(lhm.item()),
     loss_reg=np.float32(lreg.item()), mpjpe=np.float32(mp.item()),
     mpjpe_novis=np.float32(mp0.item()))

# ---- crop window arithmetic (torch mirror of dataloaderRHD.py:297-431) ---
# The reference's crop is inline in __getitem__; this mirrors it exactly so
# the JAX fixed-shape implementation can be checked end to end.
import torch.nn.functional as TF_F  # noqa: E402

Bc = 6
H = Wd = 320
crop_size = 256
img = rng.uniform(-0.5, 0.5, size=(Bc, 3, H, Wd)).astype(np.float32)
kp_uv = (rng.uniform(-20, 340, size=(Bc, 21, 2))).astype(np.float32)
kp_vis = rng.integers(0, 2, size=(Bc, 21, 1)).astype(bool)
kp_vis[0] = True
kp_vis[1] = False  # exercise the no-visible fallback

crops, uvs, Ks_out, p_y1x1, p_len = [], [], [], [], []
K6 = K[:Bc].copy()
for i in range(Bc):
    keypoint_uv21 = torch.tensor(kp_uv[i])
    keypoint_vis21 = torch.tensor(kp_vis[i])
    image = torch.tensor(img[i])
    valid = keypoint_uv21[(keypoint_uv21[:, 0] > 0) & (keypoint_uv21[:, 0] < Wd)
                          & (keypoint_uv21[:, 1] > 0) & (keypoint_uv21[:, 1] < H)]
    if valid.shape[0] > 0:
        crop_center = valid.mean(dim=0)
    else:
        crop_center = torch.tensor([crop_size / 2, crop_size / 2])
    crop_center = crop_center[[1, 0]].view(2)
    keypoint_h = keypoint_uv21[:, 1][keypoint_vis21.squeeze()]
    keypoint_w = keypoint_uv21[:, 0][keypoint_vis21.squeeze()]
    keypoint_hw = torch.stack([keypoint_h, keypoint_w], dim=1)
    if keypoint_hw.nelement() == 0:
        min_coord = torch.tensor(0.0)
        max_coord = torch.tensor((320, 320))
    else:
        min_coord = torch.maximum(torch.min(keypoint_hw, dim=0)[0],
                                  torch.tensor(0.0))
        max_coord = torch.minimum(torch.max(keypoint_hw, dim=0)[0],
                                  torch.tensor((320, 320)))
    crop_size_best = 2 * torch.maximum(max_coord - crop_center,
                                       crop_center - min_coord) + 20
    crop_size_best = torch.max(crop_size_best)
    crop_size_best = torch.clamp(crop_size_best, min=50.0, max=500.0)
    if not torch.all(torch.isfinite(crop_size_best)):
        crop_size_best = torch.tensor(200.0)
    scale = torch.clamp(crop_size / crop_size_best, 1.0, 10.0) * 1.0
    crop_size_scaled = int(crop_size / scale)
    y1 = int(crop_center[0] - crop_size_scaled // 2) \
        if int(crop_center[0] - crop_size_scaled // 2) > 0 else 0
    y2 = y1 + crop_size_scaled if y1 + crop_size_scaled < H else H
    x1 = int(crop_center[1] - crop_size_scaled // 2) \
        if int(crop_center[1] - crop_size_scaled // 2) > 0 else 0
    x2 = x1 + crop_size_scaled if x1 + crop_size_scaled < Wd else Wd
    length_y = y2 - y1
    scale_y = crop_size / length_y
    length_x = x2 - x1
    scale_x = crop_size / length_x
    cropped = TF_F.interpolate(image[:, y1:y2, x1:x2].unsqueeze(0),
                               size=(crop_size, crop_size), mode="bilinear",
                               align_corners=False).squeeze(0)
    uv_u = (keypoint_uv21[:, 0] - x1) * scale_x
    uv_v = (keypoint_uv21[:, 1] - y1) * scale_y
    scale_matrix = torch.tensor([[scale_x, 0., 0.], [0., scale_y, 0.],
                                 [0., 0., 1.]])
    trans_matrix = torch.tensor([[1., 0., -x1 * scale_x],
                                 [0., 1., -y1 * scale_y], [0., 0., 1.]])
    K_new = trans_matrix @ (scale_matrix @ torch.tensor(K6[i]))
    crops.append(cropped.permute(1, 2, 0).numpy())
    uvs.append(torch.stack([uv_u, uv_v], dim=1).numpy())
    Ks_out.append(K_new.numpy())
    p_y1x1.append([y1, x1])
    p_len.append([length_y, length_x])

save("crop", img=np.transpose(img, (0, 2, 3, 1)), kp_uv=kp_uv,
     kp_vis=kp_vis, K=K6, crops=np.stack(crops), uvs=np.stack(uvs),
     K_new=np.stack(Ks_out), y1x1=np.array(p_y1x1, np.int32),
     lens=np.array(p_len, np.int32))

print("done")

# ---- full RHD __getitem__ parity ----------------------------------------
# Build a synthetic mini-RHD tree, run the reference dataset end to end,
# and capture every sample-dict tensor.
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from handpose_tpu.data.rhd import write_synthetic_rhd  # noqa: E402

tmp = tempfile.mkdtemp(prefix="rhd_mini_")
write_synthetic_rhd(tmp, "evaluation", n=6, seed=7)

from dataloader.RHD.dataloaderRHD import RHD_HandKeypointsDataset as RefDS  # noqa: E402

ref_ds = RefDS(root_dir=tmp, set_type="evaluation")
keys = ["image", "image_crop", "keypoint_vis21", "keypoint_uv21",
        "keypoint_xyz21", "keypoint_scale", "keypoint_xyz_root",
        "keypoint_xyz21_rel_normed", "keypoint_xyz21_local",
        "kp_coord_xyz21_rel_can", "rot_mat", "scoremap",
        "camera_intrinsic_matrix", "right_hand_mask", "hand_side"]
samples = {k: [] for k in keys}
for i in range(6):
    s = ref_ds[i]
    for k in keys:
        samples[k].append(np.asarray(s[k], dtype=np.float32))
save("rhd_getitem", **{k: np.stack(v) for k, v in samples.items()})

# raw inputs for our pipeline
from handpose_tpu.data.rhd import RHDDataset  # noqa: E402

ours_ds = RHDDataset(tmp, "evaluation", num_decode_threads=2)
raw = ours_ds.raw_batch(list(range(6)))
save("rhd_raw", image=raw.image, mask=raw.mask, keypoint_uv=raw.keypoint_uv,
     keypoint_vis=raw.keypoint_vis.astype(np.float32),
     keypoint_xyz=raw.keypoint_xyz, camera_K=raw.camera_K)

# ---- InterHand2.6M __getitem__ parity ------------------------------------
# The reference class hardcodes its dataset root (dataloaderInterHand2M6.py
# :46) and is missing the `F` import (bit-rot); construct it via __new__
# with manually-filled attributes and inject torch.nn.functional.
import torch.nn.functional as _F
import dataloader.InterHand2M6.dataloaderInterHand2M6 as ih_mod

ih_mod.F = _F
from handpose_tpu.data.interhand import (InterHandDataset,
                                         write_synthetic_interhand)

ih_tmp = tempfile.mkdtemp(prefix="ih_mini_")
write_synthetic_interhand(ih_tmp, "val", n=6, seed=11)
ours_ih = InterHandDataset(ih_tmp, "val", input_img_shape=(256, 256))

ref_ih = object.__new__(ih_mod.InterHand2M6Dataset)
ref_ih.mode = "val"
ref_ih.joint_num = 21
ref_ih.root_joint_idx = {"right": 20, "left": 41}
ref_ih.joint_type = {"right": np.arange(0, 21), "left": np.arange(21, 42)}
ref_ih.sigma = 25.0
ref_ih.shuffle = False
ref_ih.use_wrist_coord = True
ref_ih.random_crop_to_size = False
ref_ih.random_crop_size = 256
ref_ih.scale_to_size = False
ref_ih.scale_target_size = (240, 320)
ref_ih.hue_aug = False
ref_ih.hue_aug_max = 0.1
ref_ih.hand_crop = True
ref_ih.coord_uv_noise = False
ref_ih.coord_uv_noise_sigma = 2.5
ref_ih.crop_center_noise = False
ref_ih.crop_center_noise_sigma = 20.0
ref_ih.crop_scale_noise = False
ref_ih.crop_offset_noise = False
ref_ih.crop_offset_noise_sigma = 10.0
ref_ih.calculate_scoremap = True
ref_ih.scoremap_dropout = False
ref_ih.scoremap_dropout_prob = 0.8
ref_ih.image_size = (320, 320)
ref_ih.crop_size = 256
ref_ih.num_kp = 42
# datalist in the reference schema, from our (independently parsed) list
ref_ih.datalist = [{
    "img_path": d["img_path"],
    "bbox": d["bbox"].copy(),
    "joint": {"cam_coord": d["joint_cam"], "img_coord": d["joint_img"],
              "valid": d["joint_valid"]},
    "hand_type": d["hand_type"],
    "hand_type_valid": 1.0,
    "cam_param": {"focal": d["focal"], "princpt": d["princpt"]},
} for d in ours_ih.datalist]

keys_ih = ["image", "image_crop", "keypoint_vis21", "keypoint_uv21",
           "keypoint_xyz21", "keypoint_scale", "keypoint_xyz_root",
           "keypoint_xyz21_rel_normed", "keypoint_xyz21_local",
           "kp_coord_xyz21_rel_can", "rot_mat", "scoremap",
           "camera_intrinsic_matrix", "right_hand_mask", "hand_side"]
acc = {k: [] for k in keys_ih}
for i in range(len(ref_ih.datalist)):
    s = ref_ih[i]
    for k in keys_ih:
        acc[k].append(np.asarray(s[k], dtype=np.float32))
save("interhand_getitem", **{k: np.stack(v) for k, v in acc.items()})

raw_ih = ours_ih.raw_batch(list(range(6)))
save("interhand_raw", image=raw_ih.image, keypoint_uv=raw_ih.keypoint_uv,
     keypoint_vis=raw_ih.keypoint_vis, keypoint_xyz=raw_ih.keypoint_xyz,
     camera_K=raw_ih.camera_K,
     hand_left=raw_ih.hand_left.astype(np.float32), bbox=raw_ih.bbox)

# ---- RHD __getitem__ parity with use_wrist_coord=False --------------------
refcfg.use_wrist_coord = False
ref_ds_palm = RefDS(root_dir=tmp, set_type="evaluation")
acc2 = {k: [] for k in keys}
for i in range(6):
    s = ref_ds_palm[i]
    for k in keys:
        acc2[k].append(np.asarray(s[k], dtype=np.float32))
save("rhd_getitem_palm", **{k: np.stack(v) for k, v in acc2.items()})
refcfg.use_wrist_coord = True
