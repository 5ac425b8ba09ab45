"""BoT-SORT tracker (reference: trackers/bot_sort.py + trackers/utils/gmc.py).

ByteTrack + camera global-motion compensation (sparse optical flow / ECC) and
the XYWH Kalman parameterisation. ReID embedding association is stubbed off by
default like the reference's with_reid=False config.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .byte_tracker import BYTETracker, STrack
from .kalman import KalmanFilterXYWH


class GMC:
    """Global motion compensation (reference trackers/utils/gmc.py).

    method: 'sparseOptFlow' (goodFeaturesToTrack + LK) or 'ecc' or 'none'.
    apply(frame) -> 2x3 affine warp from previous frame to current."""

    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, int(downscale))
        self.prev = None
        self.prev_pts = None

    def apply(self, frame: np.ndarray) -> np.ndarray:
        H = np.eye(2, 3, dtype=np.float32)
        if self.method == "none":
            return H
        import cv2

        gray = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY) if frame.ndim == 3 else frame
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale))
        if self.prev is None:
            self.prev = gray
            return H
        if self.method == "ecc":
            try:
                _, W = cv2.findTransformECC(
                    self.prev, gray, np.eye(2, 3, dtype=np.float32),
                    cv2.MOTION_EUCLIDEAN,
                    (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 50, 1e-5),
                )
                H = W
            except cv2.error:
                pass
        else:  # sparseOptFlow
            pts = cv2.goodFeaturesToTrack(
                self.prev, maxCorners=200, qualityLevel=0.01, minDistance=8
            )
            if pts is not None and len(pts) >= 4:
                nxt, status, _ = cv2.calcOpticalFlowPyrLK(self.prev, gray, pts, None)
                good = status.ravel() == 1
                if good.sum() >= 4:
                    M, _ = cv2.estimateAffinePartial2D(pts[good], nxt[good], method=cv2.RANSAC)
                    if M is not None:
                        H = M.astype(np.float32)
        self.prev = gray
        if self.downscale > 1:
            H = H.copy()
            H[:, 2] *= self.downscale
        return H


class BOTSORT(BYTETracker):
    def __init__(self, gmc_method: str = "sparseOptFlow", **kwargs):
        super().__init__(**kwargs)
        self.gmc = GMC(gmc_method)
        # BoT-SORT runs the XYWH Kalman parameterisation end-to-end (review
        # finding: the filter was created but tracks still used XYAH)
        self.kf = KalmanFilterXYWH()
        self.fmt = "xywh"

    @staticmethod
    def _apply_warp(tracks: List[STrack], H: np.ndarray):
        """Warp means AND covariances through the camera motion (reference
        byte_tracker.py multi_gmc: R8x8 = kron(I4, R); covariance rotated
        too — review finding: cov was left unwarped)."""
        if len(tracks) == 0:
            return
        R = H[:2, :2].astype(np.float64)
        t = H[:2, 2].astype(np.float64)
        R8 = np.kron(np.eye(4), R)
        for trk in tracks:
            if trk.mean is None:
                continue
            m = R8 @ trk.mean
            m[:2] += t
            trk.mean = m
            trk.covariance = R8 @ trk.covariance @ R8.T

    def update(self, boxes, scores, classes, img: Optional[np.ndarray] = None):
        if img is not None:
            H = self.gmc.apply(img)
            # ALL tracked (incl. unconfirmed) + lost, like the reference
            self._apply_warp(self.tracked, H)
            self._apply_warp(self.lost, H)
        return super().update(boxes, scores, classes)
