"""CPU PyTorch baseline replicating the reference's training step.

The upstream repo publishes no numbers (BASELINE.md), and its PyG/torch-
scatter dependencies are not installable here, so this is a clean-room
re-implementation of the reference's *algorithm* in plain torch:

  * host-side recursive quadtree decomposition per sample and per decoder
    step (the reference syncs to host each remesh, ref
    model/graph_functions.py:636);
  * dense pixel↔node mapping matmuls for flatten/unflatten
    (ref graph_functions.py:409, :457);
  * python-loop adjacency extraction (ref graph_functions.py:261-356);
  * scatter-based ChebConv (K=3, sym, λmax=2 — what PyG computes);
  * per-gate GConvLSTM conv stacks (8 graph convs per cell per step,
    ref model/model.py:394-424), encoder/decoder seq2seq with remesh every
    step, MSE loss, Adam, batch size 1 (ref mpnnlstm.py:219-322).

Used only to *measure* the reference's frames/sec on CPU for BASELINE.md;
it is not part of the TPU framework.
"""

from __future__ import annotations

import time

import numpy as np
import torch
import torch.nn as nn


# --------------------------------------------------------------------- graph


def quadtree_labels(img, thresh=0.1, max_size=8):
    n, m = img.shape
    hp, wp = -(-n // max_size) * max_size, -(-m // max_size) * max_size
    labels = np.full((hp, wp), -1, dtype=np.int64)
    imgp = np.pad(img, ((0, hp - n), (0, wp - m)), mode="edge")
    counter = [0]

    def visit(x, y, size):
        if x >= n or y >= m:
            return
        if size == 1:
            labels[x, y] = counter[0]
            counter[0] += 1
            return
        window = imgp[x : x + size + 1, y : y + size + 1]
        if window.max() > thresh:
            h = size // 2
            for cx, cy in ((x, y), (x + h, y), (x, y + h), (x + h, y + h)):
                visit(cx, cy, h)
        else:
            labels[x : x + size, y : y + size] = counter[0]
            counter[0] += 1

    for i in range(hp // max_size):
        for j in range(wp // max_size):
            visit(i * max_size, j * max_size, max_size)
    return labels[:n, :m]


def build_graph(frame_np, thresh=0.1, max_size=8):
    """frame_np: (rows, cols) channel-0 image → (mapping, counts, edge_index,
    edge_weight) torch tensors."""
    labels = quadtree_labels(frame_np, thresh, max_size)
    rows, cols = labels.shape
    flat = labels.reshape(-1)
    n_nodes = flat.max() + 1

    mapping = torch.zeros((n_nodes, rows * cols))
    mapping[flat, np.arange(rows * cols)] = 1.0
    counts = mapping.sum(1)

    # python-loop adjacency with dict dedup (reference style)
    adj = {}
    srcs, dsts = [], []
    for i in range(rows):
        for j in range(cols):
            a = labels[i, j]
            seen = adj.setdefault(a, set())
            for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                r, c = i + di, j + dj
                if 0 <= r < rows and 0 <= c < cols:
                    b = labels[r, c]
                    if b not in seen:
                        seen.add(b)
                        srcs.append(a)
                        dsts.append(b)
    edge_index = torch.tensor([srcs, dsts], dtype=torch.long)
    # distance edge weights from node centroids
    ii = np.arange(rows * cols) // cols
    jj = np.arange(rows * cols) % cols
    cy = (mapping.numpy() @ ii) / counts.numpy()
    cx = (mapping.numpy() @ jj) / counts.numpy()
    w = np.hypot(cx[srcs] - cx[dsts], cy[srcs] - cy[dsts]).astype(np.float32)
    return mapping, counts, edge_index, torch.from_numpy(w)


# --------------------------------------------------------------------- model


class ChebConvT(nn.Module):
    def __init__(self, in_ch, out_ch, K=3):
        super().__init__()
        self.lins = nn.ModuleList(
            [nn.Linear(in_ch, out_ch, bias=False) for _ in range(K)]
        )
        self.bias = nn.Parameter(torch.zeros(out_ch))
        self.K = K

    def forward(self, x, edge_index, edge_weight):
        n = x.shape[0]
        src, dst = edge_index
        deg = torch.zeros(n).index_add_(0, dst, edge_weight)
        dinv = deg.clamp(min=1e-12).rsqrt()
        dinv[deg == 0] = 0.0
        coeff = dinv[dst] * edge_weight * dinv[src]

        def a_mul(z):
            return torch.zeros_like(z).index_add_(0, dst, coeff[:, None] * z[src])

        tx0 = x
        out = self.lins[0](tx0)
        tx1 = -a_mul(x)  # L̂ = -Â for sym, λmax=2
        out = out + self.lins[1](tx1)
        tx_prev, tx = tx0, tx1
        for k in range(2, self.K):
            tx, tx_prev = -2.0 * a_mul(tx) - tx_prev, tx
            out = out + self.lins[k](tx)
        return out + self.bias


class ConvStack(nn.Module):
    def __init__(self, in_ch, out_ch, n_layers):
        super().__init__()
        layers = [ChebConvT(in_ch, out_ch)]
        layers += [ChebConvT(out_ch, out_ch) for _ in range(n_layers - 1)]
        self.layers = nn.ModuleList(layers)

    def forward(self, x, ei, ew):
        for l in self.layers:
            x = l(x, ei, ew)
        return x


class GConvLSTMT(nn.Module):
    def __init__(self, in_ch, out_ch, n_conv_layers):
        super().__init__()
        self.cx = nn.ModuleList(
            [ConvStack(in_ch, out_ch, n_conv_layers) for _ in range(4)]
        )
        self.ch = nn.ModuleList(
            [ConvStack(out_ch, out_ch, n_conv_layers) for _ in range(4)]
        )
        self.w = nn.ParameterList(
            [nn.Parameter(torch.zeros(1, out_ch)) for _ in range(3)]
        )
        self.b = nn.ParameterList(
            [nn.Parameter(torch.zeros(1, out_ch)) for _ in range(4)]
        )
        self.out_ch = out_ch

    def forward(self, x, ei, ew, h, c):
        i = torch.sigmoid(
            self.cx[0](x, ei, ew) + self.ch[0](h, ei, ew)
            + self.w[0] * c + self.b[0]
        )
        f = torch.sigmoid(
            self.cx[1](x, ei, ew) + self.ch[1](h, ei, ew)
            + self.w[1] * c + self.b[1]
        )
        t = torch.tanh(
            self.cx[2](x, ei, ew) + self.ch[2](h, ei, ew) + self.b[2]
        )
        c = f * c + i * t
        o = torch.sigmoid(
            self.cx[3](x, ei, ew) + self.ch[3](h, ei, ew)
            + self.w[2] * c + self.b[3]
        )
        return o, o * torch.tanh(c), c


class Seq2SeqT(nn.Module):
    def __init__(self, hidden=16, n_layers=2, n_conv_layers=2):
        super().__init__()
        self.enc = nn.ModuleList(
            [GConvLSTMT(4 if i == 0 else hidden, hidden, n_conv_layers)
             for i in range(n_layers)]
        )
        self.dec = nn.ModuleList(
            [GConvLSTMT(4 if i == 0 else hidden, hidden, 1)
             for i in range(n_layers)]
        )
        self.norm_h = nn.LayerNorm(hidden)
        self.norm_c = nn.LayerNorm(hidden)
        self.norm_o = nn.LayerNorm(hidden)
        self.fc1 = ChebConvT(hidden + 1, hidden)
        self.fc2 = ChebConvT(hidden, 1)
        self.hidden = hidden
        self.n_layers = n_layers


def posenc(rows, cols):
    ii = np.tile(np.arange(cols) / cols, (rows, 1))
    jj = np.tile(np.arange(rows) / rows, (cols, 1)).T
    return np.stack([ii, jj], -1).astype(np.float32)


def forward_rollout(model, x_np, t_out, thresh=0.1, max_size=8):
    """Reference-style forward (encode + autoregressive decode with remesh
    every step) on one sample → y_hat tensor (t_out, rows, cols). Gradient
    flows like the reference's forward; wrap in ``torch.no_grad()`` to eval."""
    t_in, rows, cols, _ = x_np.shape
    pe = posenc(rows, cols)
    xpe = np.concatenate(
        [x_np, np.repeat(pe[None], t_in, 0)], -1
    )  # (T, r, c, 3)

    # graph superimposing all inputs (ref seq2seq.py:278-287)
    mapping, counts, ei, ew = build_graph(x_np[..., 0].max(0), thresh, max_size)
    mapping_t = mapping
    data = torch.from_numpy(
        xpe.reshape(t_in, rows * cols, 3)
    ) .permute(2, 0, 1) @ mapping_t.T
    data = (data / counts).permute(1, 2, 0)  # (T, N, 3)
    sizes = (counts / (max_size / 2) ** 2)[None, :, None].repeat(t_in, 1, 1)
    data = torch.cat([data, sizes], -1)  # (T, N, 4)

    n = data.shape[1]
    h = torch.zeros(model.n_layers, n, model.hidden)
    c = torch.zeros(model.n_layers, n, model.hidden)
    for t in range(t_in):
        _, h0, c0 = model.enc[0](data[t], ei, ew, h[-1], c[-1])
        hs, cs = [model.norm_h(h0)], [model.norm_c(c0)]
        for i in range(1, model.n_layers):
            _, hi, ci = model.enc[i](
                hs[-1], ei, ew, torch.zeros_like(h0), torch.zeros_like(c0)
            )
            hs.append(model.norm_h(hi))
            cs.append(model.norm_c(ci))
        h, c = torch.stack(hs), torch.stack(cs)

    x_dec = data[-1]
    outputs = []
    for t in range(t_out):
        out, h0, c0 = model.dec[0](x_dec, ei, ew, h[0], c[0])
        hs, cs = [model.norm_h(h0)], [model.norm_c(c0)]
        for i in range(1, model.n_layers):
            out, hi, ci = model.dec[i](hs[-1], ei, ew, h[i], c[i])
            hs.append(model.norm_h(hi))
            cs.append(model.norm_c(ci))
        h, c = torch.stack(hs), torch.stack(cs)
        o = torch.relu(model.norm_o(out))
        o = torch.cat([o, x_dec[:, :1]], -1)
        o = model.fc2(torch.relu(model.fc1(o, ei, ew)), ei, ew)
        pred = torch.tanh(o) + x_dec[:, :1]
        img = (pred.T @ mapping_t).reshape(1, rows, cols)
        outputs.append(img[0])

        # remesh from the prediction (host round-trip, ref :434-491)
        pred_img = img.detach().numpy()[0]
        h_img = (h.permute(0, 2, 1).reshape(-1, n) @ mapping_t).reshape(
            model.n_layers, model.hidden, rows * cols
        )
        c_img = (c.permute(0, 2, 1).reshape(-1, n) @ mapping_t).reshape(
            model.n_layers, model.hidden, rows * cols
        )
        mapping_t, counts, ei, ew = build_graph(pred_img, thresh, max_size)
        n = mapping_t.shape[0]
        inv = 1.0 / counts
        h = ((h_img @ mapping_t.T) * inv).reshape(model.n_layers, model.hidden, n).permute(0, 2, 1)
        c = ((c_img @ mapping_t.T) * inv).reshape(model.n_layers, model.hidden, n).permute(0, 2, 1)
        val = torch.from_numpy(
            np.concatenate([pred_img[..., None], pe], -1).reshape(rows * cols, 3)
        )
        x_dec = torch.cat(
            [((val.T @ mapping_t.T) * inv).T,
             (counts / (max_size / 2) ** 2)[:, None]], -1
        )

    return torch.stack([o_ for o_ in outputs])


def run_sample(model, opt, x_np, y_np, thresh=0.1, max_size=8):
    """One reference-style training step on one sample (batch size 1)."""
    y_hat = forward_rollout(model, x_np, y_np.shape[0], thresh, max_size)
    loss = torch.mean((y_hat[..., None] - torch.from_numpy(y_np)) ** 2)
    opt.zero_grad()
    loss.backward()
    torch.nn.utils.clip_grad_norm_(model.parameters(), 10.0)
    opt.step()
    return float(loss.detach())


def eval_rollout(model, xs, ys, thresh=0.1, max_size=8):
    """no_grad eval over (N, T_in, r, c, 1)/(N, T_out, r, c, 1) videos →
    (y_hat (N, T_out, r, c), full-rollout MSE, next-frame MSE)."""
    outs = []
    with torch.no_grad():
        for i in range(len(xs)):
            outs.append(
                forward_rollout(model, xs[i], ys.shape[1], thresh, max_size)
                .numpy()
            )
    y_hat = np.stack(outs)
    y = ys[..., 0]
    mse = float(np.mean((y_hat - y) ** 2))
    next_mse = float(np.mean((y_hat[:, 0] - y[:, 0]) ** 2))
    return y_hat, mse, next_mse


def measure(xs, ys, hidden=16, n_layers=2, thresh=0.1, max_size=8, seed=0):
    """frames/sec (predicted frames per wall-clock second, batch 1) over the
    given (N, T_in, r, c, 1) / (N, T_out, r, c, 1) videos; sample 0 warms up."""
    torch.manual_seed(seed)
    t_out = ys.shape[1]
    model = Seq2SeqT(hidden, n_layers)
    opt = torch.optim.Adam(model.parameters(), lr=0.01)
    run_sample(model, opt, xs[0], ys[0], thresh, max_size)  # warmup
    st = time.perf_counter()
    for i in range(1, len(xs)):
        run_sample(model, opt, xs[i], ys[i], thresh, max_size)
    dt = time.perf_counter() - st
    return (len(xs) - 1) * t_out / dt


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    from quadtree_mpnnlstm_tpu.data import ModMovingMNISTDataset

    ds = ModMovingMNISTDataset(
        4, input_timesteps=4, output_timesteps=10,
        canvas_size=(64, 64), digit_size=(18, 18),
        pixel_noise=0.02, velocity_noise=0.0, seed=0,
    )
    fps = measure(ds.x, ds.y)
    print(f"torch CPU reference baseline: {fps:.4f} frames/sec")


# ---------------------------------------------------------------------------
# Ice-scale pixelwise baseline (the reference's committed flagship config:
# 224x304 grid, thresh=-inf so every valid pixel is a node, TransformerConv
# heads=1 edge_dim=2 concat=False, hidden 32, 1 layer, 3 conv layers,
# 10->90 rollout, batch 1 — ref ice_exp.py:54-58,145,153-162). Pixelwise
# graph building follows the reference's vectorized np.roll path
# (graph_functions.py:471-539); message passing is gather + index_add_
# scatter, the same algorithm PyG's kernels run.
# ---------------------------------------------------------------------------


def build_graph_pixelwise(mask, resolution=0.25):
    """(labels (r*c,), n_nodes, edge_index, edge_attr(bearing, dist))."""
    rows, cols = mask.shape
    keep = ~mask
    labels = np.full(rows * cols, -1, np.int64)
    labels[keep.reshape(-1)] = np.arange(int(keep.sum()))
    lab2 = labels.reshape(rows, cols)
    srcs, dsts, attrs = [], [], []
    for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nb = np.roll(lab2, (-dr, -dc), (0, 1))
        rr = np.arange(rows)[:, None] + dr
        cc = np.arange(cols)[None, :] + dc
        ok = (rr >= 0) & (rr < rows) & (cc >= 0) & (cc < cols)
        valid = ok & (lab2 >= 0) & (nb >= 0)
        s, d = lab2[valid], nb[valid]
        srcs.append(s)
        dsts.append(d)
        bearing = np.mod(
            np.arctan2(-dc * resolution, -dr * resolution), 2 * np.pi
        ) / (2 * np.pi)
        dist = resolution * float(np.hypot(dr, dc))
        a = np.empty((len(s), 2), np.float32)
        a[:, 0] = bearing
        a[:, 1] = dist
        attrs.append(a)
    edge_index = torch.tensor(
        np.stack([np.concatenate(srcs), np.concatenate(dsts)]),
        dtype=torch.long,
    )
    edge_attr = torch.from_numpy(np.concatenate(attrs))
    return labels, int(keep.sum()), edge_index, edge_attr


class TransformerConvT(nn.Module):
    """UniMP TransformerConv, heads=1, edge_dim=2, concat=False — what the
    reference's registry instantiates (ref model/model.py:51)."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.q = nn.Linear(in_ch, out_ch)
        self.k = nn.Linear(in_ch, out_ch)
        self.v = nn.Linear(in_ch, out_ch)
        self.e = nn.Linear(2, out_ch, bias=False)
        self.skip = nn.Linear(in_ch, out_ch)
        self.d = out_ch

    def forward(self, x, edge_index, edge_attr):
        n = x.shape[0]
        src, dst = edge_index
        e = self.e(edge_attr)
        kj = self.k(x)[src] + e
        vj = self.v(x)[src] + e
        logits = (self.q(x)[dst] * kj).sum(-1) / self.d**0.5
        m = torch.full((n,), -1e30).scatter_reduce_(
            0, dst, logits, "amax", include_self=True
        )
        ex = (logits - m[dst]).exp()
        den = torch.zeros(n).index_add_(0, dst, ex)
        alpha = ex / den[dst].clamp(min=1e-30)
        out = torch.zeros(n, self.d).index_add_(0, dst, alpha[:, None] * vj)
        return out + self.skip(x)


class TConvStack(nn.Module):
    def __init__(self, in_ch, out_ch, n_layers):
        super().__init__()
        layers = [TransformerConvT(in_ch, out_ch)]
        layers += [TransformerConvT(out_ch, out_ch) for _ in range(n_layers - 1)]
        self.layers = nn.ModuleList(layers)

    def forward(self, x, ei, ea):
        for l in self.layers:
            x = l(x, ei, ea)
        return x


class GConvLSTMIceT(nn.Module):
    def __init__(self, in_ch, out_ch, n_conv_layers):
        super().__init__()
        self.cx = nn.ModuleList(
            [TConvStack(in_ch, out_ch, n_conv_layers) for _ in range(4)]
        )
        self.ch = nn.ModuleList(
            [TConvStack(out_ch, out_ch, n_conv_layers) for _ in range(4)]
        )
        self.w = nn.ParameterList(
            [nn.Parameter(torch.zeros(1, out_ch)) for _ in range(3)]
        )
        self.b = nn.ParameterList(
            [nn.Parameter(torch.zeros(1, out_ch)) for _ in range(4)]
        )

    def forward(self, x, ei, ea, h, c):
        i = torch.sigmoid(
            self.cx[0](x, ei, ea) + self.ch[0](h, ei, ea)
            + self.w[0] * c + self.b[0]
        )
        f = torch.sigmoid(
            self.cx[1](x, ei, ea) + self.ch[1](h, ei, ea)
            + self.w[1] * c + self.b[1]
        )
        t = torch.tanh(
            self.cx[2](x, ei, ea) + self.ch[2](h, ei, ea) + self.b[2]
        )
        c = f * c + i * t
        o = torch.sigmoid(
            self.cx[3](x, ei, ea) + self.ch[3](h, ei, ea)
            + self.w[2] * c + self.b[3]
        )
        return o, o * torch.tanh(c), c


class Seq2SeqIceT(nn.Module):
    """Flagship ice config: hidden 32, n_layers 1, enc conv stacks 3 deep,
    decoder stacks 1 deep (ref seq2seq.py:106), climatology concat channel."""

    def __init__(self, in_feats=8, hidden=32, n_conv_layers=3):
        super().__init__()
        self.enc = GConvLSTMIceT(in_feats, hidden, n_conv_layers)
        self.dec = GConvLSTMIceT(4 + 0, hidden, 1)
        self.norm_h = nn.LayerNorm(hidden)
        self.norm_c = nn.LayerNorm(hidden)
        self.norm_o = nn.LayerNorm(hidden)
        self.fc1 = TransformerConvT(hidden + 1, hidden)
        self.fc2 = TransformerConvT(hidden, 1)
        self.hidden = hidden


def forward_rollout_ice(model, x_np, t_out, mask):
    """Reference-style pixelwise forward on one (T_in, r, c, 5) sample."""
    t_in, rows, cols, nvars = x_np.shape
    pe = posenc(rows, cols)
    labels, n, ei, ea = build_graph_pixelwise(mask)  # per sample, ref-style
    keep = labels >= 0
    order = labels[keep]  # raster position -> node id (identity-sorted)

    def flatten_px(img_flat):
        out = np.empty((n,) + img_flat.shape[1:], np.float32)
        out[order] = img_flat[keep]
        return torch.from_numpy(out)

    xpe = np.concatenate([x_np, np.repeat(pe[None], t_in, 0)], -1)
    data = [flatten_px(xpe[t].reshape(rows * cols, -1)) for t in range(t_in)]
    sizes = torch.full((n, 1), 0.25**2)
    data = [torch.cat([d, sizes], -1) for d in data]

    h = torch.zeros(n, model.hidden)
    c = torch.zeros(n, model.hidden)
    for t in range(t_in):
        _, h, c = model.enc(data[t], ei, ea, h, c)
        h, c = model.norm_h(h), model.norm_c(c)

    nf = data[-1].shape[-1]
    x_dec = data[-1][:, [0, nf - 3, nf - 2, nf - 1]]
    clim = torch.zeros(n, 1)
    outputs = []
    for t in range(t_out):
        out, h, c = model.dec(x_dec, ei, ea, h, c)
        h, c = model.norm_h(h), model.norm_c(c)
        o = torch.relu(model.norm_o(out))
        o = torch.cat([o, clim], -1)
        o = model.fc2(torch.relu(model.fc1(o, ei, ea)), ei, ea)
        pred = torch.tanh(o) + x_dec[:, :1]
        img = torch.zeros(rows * cols, 1)
        img[keep] = pred[order]
        outputs.append(img.reshape(rows, cols))
        x_dec = torch.cat([pred, x_dec[:, 1:]], -1)
    return torch.stack(outputs)


def measure_ice(mask, n_steps=2, t_in=10, t_out=90, seed=0):
    """frames/sec of the flagship ice-scale config, reference-style torch
    CPU (batch 1, fwd+bwd+Adam); one warmup sample excluded."""
    rng = np.random.default_rng(seed)
    rows, cols = mask.shape
    model = Seq2SeqIceT()
    opt = torch.optim.Adam(model.parameters(), lr=0.01)

    def sample():
        x = rng.random((t_in, rows, cols, 5)).astype(np.float32)
        y = rng.random((t_out, rows, cols, 1)).astype(np.float32)
        return x, y

    def run(x, y):
        y_hat = forward_rollout_ice(model, x, t_out, mask)
        yt = torch.from_numpy(y[..., 0])
        valid = torch.from_numpy(~mask)
        loss = torch.mean(((y_hat - yt) ** 2)[:, valid])
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 10.0)
        opt.step()
        return float(loss.detach())

    run(*sample())  # warmup
    st = time.perf_counter()
    for _ in range(n_steps):
        run(*sample())
    dt = time.perf_counter() - st
    return n_steps * t_out / dt
