"""Golden-parity oracle: an independent PyTorch implementation of the
Open-Unmix mask network, mirroring upstream open-unmix-pytorch's
OpenUnmix module (the model the reference validated against via
print-and-diff, README.md:229-247).  Built directly on torch.nn.LSTM /
Linear / BatchNorm1d so it shares *no* code with the JAX implementation
under test — agreement between the two is meaningful evidence.

Weights load from the same per-target torch-layout state dicts that the
ggml converter consumes, so the oracle can be driven by synthetic or
real checkpoints alike.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn


class TorchUMX(nn.Module):
    """One target's mask network (upstream OpenUnmix, inference mode)."""

    def __init__(self, hidden_size: int, nb_bins: int = 1487, nb_output_bins: int = 2049):
        super().__init__()
        self.nb_bins = nb_bins
        self.nb_output_bins = nb_output_bins
        self.hidden_size = hidden_size
        self.fc1 = nn.Linear(nb_bins * 2, hidden_size, bias=False)
        self.bn1 = nn.BatchNorm1d(hidden_size)
        self.lstm = nn.LSTM(
            input_size=hidden_size,
            hidden_size=hidden_size // 2,
            num_layers=3,
            bidirectional=True,
            batch_first=False,
            dropout=0.0,
        )
        self.fc2 = nn.Linear(hidden_size * 2, hidden_size, bias=False)
        self.bn2 = nn.BatchNorm1d(hidden_size)
        self.fc3 = nn.Linear(hidden_size, nb_output_bins * 2, bias=False)
        self.bn3 = nn.BatchNorm1d(nb_output_bins * 2)
        self.input_mean = nn.Parameter(torch.zeros(nb_bins))
        self.input_scale = nn.Parameter(torch.ones(nb_bins))
        self.output_scale = nn.Parameter(torch.ones(nb_output_bins))
        self.output_mean = nn.Parameter(torch.zeros(nb_output_bins))

    @torch.no_grad()
    def load_target_state_dict(self, sd: dict[str, np.ndarray]):
        tensors = {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in sd.items()}
        self.load_state_dict(tensors, strict=False)

    @torch.no_grad()
    def forward(
        self,
        x: torch.Tensor,
        input_scaling: str = "openunmix",
        state=None,
        return_state: bool = False,
    ):
        """x: (T, 2*nb_bins) cropped stacked-stereo magnitudes →
        mask (T, 2*nb_output_bins).

        ``state`` is an optional nn.LSTM (h0, c0) pair carried from a
        previous segment — the reference's streaming LSTM whose arenas
        persist across segments (umx.cpp:167-171, lstm.cpp:82).  With
        ``return_state`` the new (hT, cT) is returned alongside the mask.
        """
        self.eval()
        T = x.shape[0]
        mean = torch.cat([self.input_mean, self.input_mean])
        scale = torch.cat([self.input_scale, self.input_scale])
        if input_scaling == "openunmix":
            x = (x + mean) * scale
        else:
            x = x * scale + mean
        x = self.fc1(x)
        x = self.bn1(x)
        x = torch.tanh(x)
        # nn.LSTM wants (T, batch, feat)
        lstm_out, new_state = self.lstm(x.unsqueeze(1), state)
        x = torch.cat([x, lstm_out.squeeze(1)], dim=-1)
        x = self.fc2(x)
        x = self.bn2(x)
        x = torch.relu(x)
        x = self.fc3(x)
        x = self.bn3(x)
        out_scale = torch.cat([self.output_scale, self.output_scale])
        out_mean = torch.cat([self.output_mean, self.output_mean])
        x = x * out_scale + out_mean
        mask = torch.relu(x).reshape(T, -1)
        return (mask, new_state) if return_state else mask


@torch.no_grad()
def oracle_intermediates(
    model: TorchUMX, x: torch.Tensor, input_scaling: str = "openunmix"
) -> dict[str, np.ndarray]:
    """Per-stage activations for layer-parity testing (automates the
    reference's print-and-diff methodology, README.md:229-247)."""
    model.eval()
    out = {}
    mean = torch.cat([model.input_mean, model.input_mean])
    scale = torch.cat([model.input_scale, model.input_scale])
    h = (x + mean) * scale if input_scaling == "openunmix" else x * scale + mean
    out["input_scaled"] = h.numpy().copy()
    h = torch.tanh(model.bn1(model.fc1(h)))
    out["bn1_tanh"] = h.numpy().copy()
    lstm_in = h.unsqueeze(1)
    for layer in range(3):
        # run the stacked LSTM one layer at a time by slicing its weights
        l = torch.nn.LSTM(
            input_size=lstm_in.shape[-1],
            hidden_size=model.hidden_size // 2,
            num_layers=1,
            bidirectional=True,
        )
        for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            for rev in ("", "_reverse"):
                getattr(l, f"{kind}_l0{rev}").data.copy_(
                    getattr(model.lstm, f"{kind}_l{layer}{rev}")
                )
        lstm_in, _ = l(lstm_in)
        out[f"lstm_l{layer}"] = lstm_in.squeeze(1).numpy().copy()
    z = torch.cat([h, lstm_in.squeeze(1)], dim=-1)
    z = torch.relu(model.bn2(model.fc2(z)))
    out["bn2_relu"] = z.numpy().copy()
    z = model.bn3(model.fc3(z))
    out["bn3"] = z.numpy().copy()
    out_scale = torch.cat([model.output_scale, model.output_scale])
    out_mean = torch.cat([model.output_mean, model.output_mean])
    out["mask"] = torch.relu(z * out_scale + out_mean).numpy().copy()
    return out


def oracle_masks(
    state_dicts: dict[str, dict[str, np.ndarray]],
    x: np.ndarray,
    hidden_size: int,
    input_scaling: str = "openunmix",
) -> np.ndarray:
    """Masks for all 4 targets, stacked in (bass, drums, other, vocals)
    order: x (T, 2974) → (4, T, 4098)."""
    from umx_tpu.io.ggml import TARGET_ORDER

    nb_bins = x.shape[1] // 2
    outs = []
    for t in TARGET_ORDER:
        m = TorchUMX(hidden_size, nb_bins=nb_bins)
        m.load_target_state_dict(state_dicts[t])
        outs.append(m.forward(torch.from_numpy(x), input_scaling).numpy())
    return np.stack(outs)


def oracle_masks_stream(
    state_dicts: dict[str, dict[str, np.ndarray]],
    xs: list[np.ndarray],
    hidden_size: int,
    input_scaling: str = "openunmix",
) -> list[np.ndarray]:
    """Like :func:`oracle_masks` but over SEQUENTIAL segments with the
    LSTM state carried across boundaries — the reference's streaming
    LSTM semantics (persistent arenas, umx.cpp:167-171 / lstm.cpp:82).
    Returns one stacked (4, T, 4098) mask array per segment."""
    from umx_tpu.io.ggml import TARGET_ORDER

    nb_bins = xs[0].shape[1] // 2
    models = []
    for t in TARGET_ORDER:
        m = TorchUMX(hidden_size, nb_bins=nb_bins)
        m.load_target_state_dict(state_dicts[t])
        models.append(m)
    states = [None] * len(models)
    outs = []
    for x in xs:
        seg = []
        for i, m in enumerate(models):
            mask, states[i] = m.forward(
                torch.from_numpy(x), input_scaling, state=states[i], return_state=True
            )
            seg.append(mask.numpy())
        outs.append(np.stack(seg))
    return outs
