"""Plotting / visualization (reference: utils/plotting.py — Annotator:108,
plot_images:804, plot_results:956, KITTIVisualizer:1226).

PIL-based drawing (cv2 is not in this image); matplotlib functions degrade to
a no-op when the backend is unavailable (headless CI).
"""

from __future__ import annotations

import csv
import math
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

COLORS = np.array(
    [
        [255, 56, 56], [255, 157, 151], [255, 112, 31], [255, 178, 29],
        [207, 210, 49], [72, 249, 10], [146, 204, 23], [61, 219, 134],
        [26, 147, 52], [0, 212, 187], [44, 153, 168], [0, 194, 255],
        [52, 69, 147], [100, 115, 255], [0, 24, 236], [132, 56, 255],
    ],
    np.uint8,
)


def color_for(idx: int):
    c = COLORS[int(idx) % len(COLORS)]
    return int(c[0]), int(c[1]), int(c[2])


class Annotator:
    """Box/label/line/region/keypoint drawing over an RGB ndarray (reference
    plotting.py:108). PIL.ImageDraw backend; `result()` returns the ndarray.

    Carries the solution-app drawing surface: draw_region,
    draw_centroid_and_tracks, count_labels (object_counter.py:165-247),
    estimate_pose_angle / draw_specific_points /
    plot_angle_and_count_and_stage (ai_gym.py:85-130) and
    plot_distance_and_line (distance_calculation.py:155)."""

    def __init__(self, img: np.ndarray, line_width: Optional[int] = None, names=None):
        from PIL import Image, ImageDraw

        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = (img * 255).clip(0, 255).astype(np.uint8)
        self._im = Image.fromarray(np.ascontiguousarray(img))
        self.draw = ImageDraw.Draw(self._im)
        self.lw = line_width or max(round(sum(img.shape[:2]) / 2 * 0.003), 2)
        self.names = names

    @staticmethod
    def _c(color):
        return tuple(int(v) for v in color)

    def text(self, xy, label: str, txt_color=(255, 255, 255), box_color=None):
        """Text at xy; optional filled background box."""
        if box_color is not None:
            x1, y1, x2, y2 = self.draw.textbbox((int(xy[0]), int(xy[1])), label)
            pad = max(self.lw, 2)
            self.draw.rectangle(
                (x1 - pad, y1 - pad, x2 + pad, y2 + pad), fill=self._c(box_color)
            )
        self.draw.text((int(xy[0]), int(xy[1])), label, fill=self._c(txt_color))

    def box_label(self, xyxy, label: str = "", color=(128, 128, 128), txt_color=(255, 255, 255)):
        p1 = (int(xyxy[0]), int(xyxy[1]))
        p2 = (int(xyxy[2]), int(xyxy[3]))
        self.draw.rectangle((p1, p2), outline=self._c(color), width=self.lw)
        if label:
            self.text((p1[0], max(p1[1] - 12, 0)), label, txt_color, box_color=color)

    def line(self, p1, p2, color=(128, 128, 128), width: Optional[int] = None):
        self.draw.line(
            [(int(p1[0]), int(p1[1])), (int(p2[0]), int(p2[1]))],
            fill=self._c(color), width=width or self.lw,
        )

    def circle(self, center, radius: int, color=(255, 0, 255), fill=True):
        x, y = int(center[0]), int(center[1])
        box = (x - radius, y - radius, x + radius, y + radius)
        if fill:
            self.draw.ellipse(box, fill=self._c(color))
        else:
            self.draw.ellipse(box, outline=self._c(color), width=self.lw)

    def draw_region(self, reg_pts, color=(255, 0, 255), thickness: int = 5):
        """Closed counting region / line (reference object_counter.py:252)."""
        pts = [(int(p[0]), int(p[1])) for p in reg_pts]
        closed = pts + [pts[0]] if len(pts) >= 3 else pts
        self.draw.line(closed, fill=self._c(color), width=thickness)

    def draw_centroid_and_tracks(self, track, color=(0, 255, 0), track_thickness: int = 2):
        """Track trail polyline + centroid dot (reference plotting.py:396)."""
        pts = [(int(p[0]), int(p[1])) for p in track]
        if len(pts) >= 2:
            self.draw.line(pts, fill=self._c(color), width=track_thickness)
        self.circle(pts[-1], track_thickness * 2 + 1, color)

    def count_labels(self, counts: str, txt_color=(0, 0, 0), color=(255, 255, 255), count_txt_size: int = 2):
        """In/out count banner top-center (reference plotting.py:373)."""
        w = self._im.size[0]
        tw = self.draw.textlength(counts)
        self.text(((w - tw) / 2, 10), counts, txt_color, box_color=color)

    @staticmethod
    def estimate_pose_angle(a, b, c) -> float:
        """Angle at keypoint b formed by a-b-c, degrees in [0, 180]
        (reference plotting.py:430 ``estimate_pose_angle``)."""
        a, b, c = (np.asarray(p, np.float64)[:2] for p in (a, b, c))
        ang = math.degrees(
            math.atan2(c[1] - b[1], c[0] - b[0]) - math.atan2(a[1] - b[1], a[0] - b[0])
        )
        ang = abs(ang) % 360
        return 360 - ang if ang > 180 else ang

    def draw_specific_points(self, keypoints, indices, shape=(640, 640), radius: int = 2):
        """Highlight the workout keypoints (reference plotting.py:443)."""
        kpts = np.asarray(keypoints)
        for i in indices:
            k = kpts[int(i)]
            if len(k) >= 3 and k[2] < 0.25:
                continue
            if k[0] % shape[0] == 0 or k[1] % shape[1] == 0 or k[0] < 0 or k[1] < 0:
                continue
            self.circle((k[0], k[1]), radius, (0, 255, 0))
        return self.result()

    def plot_angle_and_count_and_stage(
        self, angle_text, count_text, stage_text, center_kpt, line_thickness: int = 2
    ):
        """Workout angle/count/stage stack next to a keypoint (reference
        plotting.py:459)."""
        x, y = int(center_kpt[0]), int(center_kpt[1])
        for i, txt in enumerate(
            (f"{float(angle_text):.1f} deg", f"reps {count_text}", f"stage {stage_text}")
        ):
            self.text((x + 10, y + i * 14), txt, (0, 0, 0), box_color=(255, 255, 255))

    def plot_distance_and_line(
        self, distance_m, distance_mm, centroids, line_color=(255, 255, 0), centroid_color=(255, 0, 255)
    ):
        """Distance readout + centroid connector (reference plotting.py:492)."""
        self.text((15, 25), f"Distance M: {distance_m:.2f}m", (0, 0, 0), box_color=(255, 255, 255))
        self.text((15, 45), f"Distance MM: {distance_mm:.2f}mm", (0, 0, 0), box_color=(255, 255, 255))
        self.line(centroids[0], centroids[1], line_color, 3)
        self.circle(centroids[0], 6, centroid_color)
        self.circle(centroids[1], 6, centroid_color)

    def result(self):
        return np.asarray(self._im)


def plot_images(
    imgs: np.ndarray,          # (B, H, W, 3) [0,1] or uint8
    gt_bboxes: Optional[np.ndarray] = None,   # (B, M, 4) normalized xywh
    gt_labels: Optional[np.ndarray] = None,
    mask_gt: Optional[np.ndarray] = None,
    fname: str = "batch.jpg",
    max_imgs: int = 16,
) -> Optional[str]:
    """Mosaic grid with GT boxes (reference plotting.py:804 ``plot_images``)."""
    from PIL import Image

    imgs = np.asarray(imgs[:max_imgs])
    if imgs.dtype != np.uint8:
        imgs = (imgs * 255).clip(0, 255).astype(np.uint8)
    B, H, W = imgs.shape[:3]
    cols = int(math.ceil(math.sqrt(B)))
    rows = int(math.ceil(B / cols))
    canvas = np.full((rows * H, cols * W, 3), 255, np.uint8)
    for i in range(B):
        r, c = divmod(i, cols)
        tile = imgs[i].copy()
        if gt_bboxes is not None:
            ann = Annotator(tile)
            m = mask_gt[i] if mask_gt is not None else np.ones(len(gt_bboxes[i]), bool)
            for j in np.nonzero(m)[0]:
                cx, cy, bw, bh = gt_bboxes[i][j] * [W, H, W, H]
                cls = int(gt_labels[i][j]) if gt_labels is not None else 0
                ann.box_label(
                    [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                    str(cls), color_for(cls),
                )
            tile = ann.result()
        canvas[r * H : (r + 1) * H, c * W : (c + 1) * W] = tile
    Path(fname).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(canvas).save(str(fname))
    return str(fname)


def plot_results(csv_path, fname: Optional[str] = None) -> Optional[str]:
    """Training-curve plots from results.csv (reference plotting.py:956)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    rows = list(csv.DictReader(open(csv_path)))
    if not rows:
        return None
    keys = [k for k in rows[0] if k not in ("epoch",) and rows[0][k] not in ("", None)]
    numeric = {}
    for k in keys:
        try:
            numeric[k] = [float(r[k]) for r in rows if r.get(k)]
        except (TypeError, ValueError):
            continue
    n = len(numeric)
    if n == 0:
        return None
    cols = min(4, n)
    rws = int(math.ceil(n / cols))
    fig, axes = plt.subplots(rws, cols, figsize=(4 * cols, 3 * rws), squeeze=False)
    for ax, (k, v) in zip(axes.ravel(), numeric.items()):
        ax.plot(v)
        ax.set_title(k, fontsize=9)
    for ax in axes.ravel()[n:]:
        ax.axis("off")
    fig.tight_layout()
    fname = fname or str(Path(csv_path).with_name("results.png"))
    fig.savefig(fname, dpi=120)
    plt.close(fig)
    return fname


class KITTIVisualizer:
    """Projected-3D-box and BEV plots (reference plotting.py:1226)."""

    def __init__(self, class_names: Sequence[str] = ("Car", "Pedestrian", "Cyclist")):
        self.class_names = list(class_names)

    @staticmethod
    def _corners_cam(loc, dims, ry):
        h, w, l = dims
        x = np.array([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2])
        y = np.array([0, 0, 0, 0, -h, -h, -h, -h], float)
        z = np.array([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2])
        c, s = np.cos(ry), np.sin(ry)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return (R @ np.vstack([x, y, z])).T + np.asarray(loc)

    def draw_3d_box(self, ann: Annotator, calib, loc, dims, ry, color=(0, 255, 80)):
        """Project the 8 corners and draw the 12 edges."""
        corners = self._corners_cam(loc, dims, ry)
        if (corners[:, 2] <= 0.1).any():
            return
        pts, _ = calib.rect_to_img(corners)
        edges = [
            (0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
            (0, 4), (1, 5), (2, 6), (3, 7),
        ]
        for a, b in edges:
            ann.line(pts[a], pts[b], color)

    def plot_preds(self, img: np.ndarray, rows: List, calib, fname: str) -> Optional[str]:
        """rows: KITTI-format prediction rows [cls, alpha, x1..y2, h, w, l,
        x, y, z, ry, score]."""
        from PIL import Image

        ann = Annotator(img.copy())
        for r in rows:
            cls_id = int(r[0])
            ann.box_label(r[2:6], f"{self.class_names[cls_id]} {r[-1]:.2f}", color_for(cls_id))
            self.draw_3d_box(ann, calib, r[9:12], r[6:9], r[12], color_for(cls_id))
        Path(fname).parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(ann.result()).save(str(fname))
        return str(fname)

    def plot_bev(self, rows_pred: List, rows_gt: List, fname: str, extent=50) -> Optional[str]:
        """Bird's-eye-view footprint plot (reference plot_bev)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return None
        fig, ax = plt.subplots(figsize=(6, 8))
        for rows, color in ((rows_gt, "tab:green"), (rows_pred, "tab:red")):
            for r in rows:
                x, z = r[9], r[11]
                h, w, l = r[6:9]
                ry = r[12]
                c, s = math.cos(ry), math.sin(ry)
                dx = np.array([l / 2, l / 2, -l / 2, -l / 2, l / 2])
                dz = np.array([w / 2, -w / 2, -w / 2, w / 2, w / 2])
                xs = x + dx * c + dz * s
                zs = z - dx * s + dz * c
                ax.plot(xs, zs, color=color, lw=1)
        ax.set_xlim(-extent, extent)
        ax.set_ylim(0, extent * 1.6)
        ax.set_aspect("equal")
        ax.set_xlabel("x (m)")
        ax.set_ylabel("z (m)")
        fig.tight_layout()
        Path(fname).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(fname, dpi=120)
        plt.close(fig)
        return str(fname)


def plot_labels(boxes, cls, names=None, save_dir: str = ".") -> Optional[str]:
    """Label-distribution panel: class histogram, box-center heat, w/h
    scatter (reference plotting.py:608 ``plot_labels``). boxes: (N, 4)
    normalized xywh; cls: (N,)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    cls = np.asarray(cls).reshape(-1)
    fig, axes = plt.subplots(2, 2, figsize=(8, 8))
    nc = int(cls.max()) + 1 if len(cls) else 1
    axes[0, 0].hist(cls, bins=np.arange(nc + 1) - 0.5, rwidth=0.8)
    axes[0, 0].set_title("classes")
    if names:
        axes[0, 0].set_xticks(range(nc))
        axes[0, 0].set_xticklabels(
            [str(names.get(i, i)) for i in range(nc)], rotation=90, fontsize=6
        )
    axes[0, 1].hist2d(boxes[:, 0], boxes[:, 1], bins=50, cmap="Blues")
    axes[0, 1].set_title("xy centers")
    axes[1, 0].hist2d(boxes[:, 2], boxes[:, 3], bins=50, cmap="Blues")
    axes[1, 0].set_title("wh")
    axes[1, 1].scatter(boxes[:, 2], boxes[:, 3], s=2, alpha=0.3)
    axes[1, 1].set_title("wh scatter")
    fig.tight_layout()
    out = str(Path(save_dir) / "labels.jpg")
    Path(save_dir).mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_labels_3D(depths, sizes_3d, cls, save_dir: str = ".") -> Optional[str]:
    """3D label distribution: depth histogram + per-class size boxplots
    (fork reference plotting.py:717 ``plot_labels_3D``)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    depths = np.asarray(depths, np.float64).reshape(-1)
    sizes = np.asarray(sizes_3d, np.float64).reshape(-1, 3)
    cls = np.asarray(cls).reshape(-1)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].hist(depths, bins=60)
    axes[0].set_title("depth (m)")
    for i, name in enumerate(("h", "w", "l")):
        for c in np.unique(cls):
            axes[1].hist(sizes[cls == c, i], bins=30, alpha=0.4,
                         label=f"{name} cls{int(c)}" if i == 0 else None)
    axes[1].set_title("3D sizes")
    axes[2].scatter(depths, sizes[: len(depths), 0] if len(sizes) else [], s=2, alpha=0.3)
    axes[2].set_title("depth vs height")
    fig.tight_layout()
    out = str(Path(save_dir) / "labels_3d.jpg")
    Path(save_dir).mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_training_depth_dist(pred_depths, gt_depths, save_dir: str = ".", epoch: int = 0) -> Optional[str]:
    """Predicted-vs-GT depth distribution per epoch (fork reference
    plotting.py:743)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(np.asarray(gt_depths).reshape(-1), bins=60, alpha=0.5, label="gt")
    ax.hist(np.asarray(pred_depths).reshape(-1), bins=60, alpha=0.5, label="pred")
    ax.legend()
    ax.set_xlabel("depth (m)")
    ax.set_title(f"depth distribution, epoch {epoch}")
    fig.tight_layout()
    out = str(Path(save_dir) / f"depth_dist_e{epoch}.jpg")
    Path(save_dir).mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out
