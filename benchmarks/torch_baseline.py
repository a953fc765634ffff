"""CPU PyTorch baseline for the north-star comparison (BASELINE.json:
">=10x images/sec/chip over the CPU PyTorch baseline").

A from-scratch torch implementation of the reference student architecture
(ResNet-50 bottleneck encoder -> 49x256 tokens -> 2-layer LSTM with additive
attention -> greedy decode, eager per-step loop with .item() syncs — the
reference's execution model, SURVEY §3.4).  torchvision is not installed in
this image, so the backbone is defined here directly; throughput does not
depend on weight values.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    def __init__(self, in_ch, mid, stride=1):
        super().__init__()
        out_ch = mid * 4
        self.conv1 = nn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        self.down = None
        if stride != 1 or in_ch != out_ch:
            self.down = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_ch))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class ResNet50Headless(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        layers = []
        in_ch = 64
        for mid, blocks, stride in [(64, 3, 1), (128, 4, 2), (256, 6, 2),
                                    (512, 3, 2)]:
            for b in range(blocks):
                layers.append(Bottleneck(in_ch, mid, stride if b == 0 else 1))
                in_ch = mid * 4
        self.layers = nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        return self.layers(x)  # (B, 2048, 7, 7)


class TorchBaselineStudent(nn.Module):
    """Reference-architecture full student, eager greedy decode."""

    def __init__(self, vocab_size=2994, embed=256, hidden=512, layers=2):
        super().__init__()
        self.backbone = ResNet50Headless()
        self.proj = nn.Sequential(nn.Linear(2048, embed), nn.ReLU(),
                                  nn.Dropout(0.2), nn.LayerNorm(embed))
        self.embedding = nn.Embedding(vocab_size, embed)
        self.attention = nn.Linear(hidden + embed, embed)
        self.attention_combine = nn.Linear(2 * embed, embed)
        self.lstm = nn.LSTM(embed, hidden, layers, batch_first=True)
        self.out = nn.Sequential(nn.Linear(hidden, embed), nn.ReLU(),
                                 nn.Dropout(0.2), nn.Linear(embed, vocab_size))
        self.hidden_size = hidden
        self.num_layers = layers

    def encode(self, images):
        f = self.backbone(images)                       # (B, 2048, 7, 7)
        f = f.flatten(2).permute(0, 2, 1)               # (B, 49, 2048)
        return self.proj(f)                             # (B, 49, E)

    @torch.no_grad()
    def greedy_decode(self, images, max_length=20, start_id=1, end_id=2):
        self.eval()
        feats = self.encode(images)
        B = images.size(0)
        h = torch.zeros(self.num_layers, B, self.hidden_size)
        c = torch.zeros(self.num_layers, B, self.hidden_size)
        tok = torch.full((B,), start_id, dtype=torch.long)
        outs = []
        for _ in range(max_length):
            emb = self.embedding(tok)
            L = feats.size(1)
            hid = h[-1].unsqueeze(1).expand(B, L, self.hidden_size)
            scores = torch.tanh(self.attention(
                torch.cat([hid, feats], dim=2))).sum(2)
            w = torch.softmax(scores, dim=1)
            ctx = torch.bmm(w.unsqueeze(1), feats).squeeze(1)
            x = self.attention_combine(torch.cat([emb, ctx], dim=1))
            o, (h, c) = self.lstm(x.unsqueeze(1), (h, c))
            logits = self.out(o.squeeze(1))
            tok = logits.argmax(dim=1)
            # the reference syncs per step via .item(); emulate the host
            # round-trip cost for a faithful baseline
            _ = int(tok[0].item())
            outs.append(tok)
        return torch.stack(outs, dim=1)
