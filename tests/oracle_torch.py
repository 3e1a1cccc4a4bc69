"""Independent torch-CPU oracle for the CSPN functional spec.

A direct ~60-line transcription of SURVEY.md section 4.1-4.2 (the paper's
Eq. 1-5) in PyTorch, written independently of the JAX implementation, used
only by the parity tests (SURVEY.md section 5.2 item 1). Layout matches the
JAX op: guidance (B, H, W, 8), depth (B, H, W), neighbor channel order
row-major over the 3x3 neighborhood minus center.
"""

import torch
import torch.nn.functional as F

OFFSETS = [(-1, -1), (-1, 0), (-1, 1),
           (0, -1), (0, 1),
           (1, -1), (1, 0), (1, 1)]


def cspn_oracle(guidance, blur_depth, sparse_depth=None, num_iters=24,
                norm_type="8sum", eps=1e-8):
    """guidance: (B,H,W,8) float tensor; depths: (B,H,W). Returns (B,H,W)."""
    g = guidance.double()
    if norm_type == "8sum_abs":
        g = g.abs()
    floor = 1.0 if norm_type == "8sum_clamp" else eps
    abs_sum = g.abs().sum(dim=-1, keepdim=True).clamp_min(floor)
    gate = g / abs_sum                       # (B,H,W,8)
    g0 = 1.0 - gate.sum(dim=-1)              # (B,H,W)

    d = blur_depth.double()
    b, h, w = d.shape
    if sparse_depth is not None:
        sp = sparse_depth.double()
        m = (sp > 0).double()
        d = (1.0 - m) * d + m * sp           # anchor d^0 too (matches JAX op)

    for _ in range(num_iters):
        padded = F.pad(d, (1, 1, 1, 1))      # zero border
        new = g0 * d
        for k, (dy, dx) in enumerate(OFFSETS):
            new = new + gate[..., k] * padded[:, 1 + dy:1 + dy + h,
                                              1 + dx:1 + dx + w]
        if sparse_depth is not None:
            new = (1.0 - m) * new + m * sp
        d = new
    return d
