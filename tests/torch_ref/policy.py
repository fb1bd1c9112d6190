"""Test-only torch oracle implementing the reference PolicyNet semantics
(MLP -> 2-layer LSTM with per-step done-masked state -> heads) for
numerical comparison. Written against the documented behavior of
src/models.py; not a vendored copy."""

import torch
import torch.nn as nn


class TorchPolicy(nn.Module):
    def __init__(self, obs_size, num_actions, batch_norm=False):
        super().__init__()
        layers = [
            nn.Linear(obs_size, 1024), nn.ReLU(),
            nn.Linear(1024, 1024), nn.ReLU(),
        ]
        if batch_norm:
            layers = [nn.BatchNorm1d(obs_size)] + layers
        self.fc = nn.Sequential(*layers)
        self.core = nn.LSTM(1024, 1024, 2)
        self.policy = nn.Linear(1024, num_actions)
        self.baseline = nn.Linear(1024, 1)

    def initial_state(self, batch_size):
        return tuple(torch.zeros(2, batch_size, 1024) for _ in range(2))

    def forward(self, obs, done, state):
        t, b = obs.shape[:2]
        x = self.fc(obs.reshape(t * b, -1).float()).view(t, b, -1)
        notdone = (1 - done.float())
        outs = []
        for step in range(t):
            nd = notdone[step].view(1, -1, 1)
            state = tuple(nd * s for s in state)
            out, state = self.core(x[step].unsqueeze(0), state)
            outs.append(out)
        core_out = torch.cat(outs).flatten(0, 1)
        logits = self.policy(core_out).view(t, b, -1)
        baseline = self.baseline(core_out).view(t, b)
        return logits, baseline, state


class TorchConvPolicy(nn.Module):
    """Oracle for PolicyNetWithConv: 5x(conv3x3 s2 p1, ELU) per frame on
    transpose(1,3)-swapped pixels, frame maps concatenated on the last
    axis, /255 input scaling."""

    def __init__(self, obs_shape, num_actions, batch_norm=False):
        super().__init__()
        h, w, cn = obs_shape
        self.n_frames = cn // 3
        convs = []
        ch = 3
        for _ in range(5):
            convs += [nn.Conv2d(ch, 32, 3, 2, 1), nn.ELU()]
            ch = 32
        self.feat_extract = nn.Sequential(*convs)
        with torch.no_grad():
            dummy = self.feat_extract(torch.zeros(1, 3, w, h))
        conv_out = int(dummy.numel()) * self.n_frames
        layers = [
            nn.Linear(conv_out, 1024), nn.ReLU(),
            nn.Linear(1024, 1024), nn.ReLU(),
        ]
        if batch_norm:
            layers = [nn.BatchNorm1d(conv_out)] + layers
        self.fc = nn.Sequential(*layers)
        self.core = nn.LSTM(1024, 1024, 2)
        self.policy = nn.Linear(1024, num_actions)
        self.baseline = nn.Linear(1024, 1)

    def initial_state(self, batch_size):
        return tuple(torch.zeros(2, batch_size, 1024) for _ in range(2))

    def forward(self, obs, done, state):
        t, b = obs.shape[:2]
        x = obs.flatten(0, 1).float() / 255.0
        frames = torch.split(x, 3, dim=-1)
        maps = [self.feat_extract(f.transpose(1, 3)) for f in frames]
        x = torch.cat(maps, dim=-1).view(t * b, -1)
        x = self.fc(x).view(t, b, -1)
        notdone = (1 - done.float())
        outs = []
        for step in range(t):
            nd = notdone[step].view(1, -1, 1)
            state = tuple(nd * s for s in state)
            out, state = self.core(x[step].unsqueeze(0), state)
            outs.append(out)
        core_out = torch.cat(outs).flatten(0, 1)
        logits = self.policy(core_out).view(t, b, -1)
        baseline = self.baseline(core_out).view(t, b)
        return logits, baseline, state
