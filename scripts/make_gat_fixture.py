"""Generate the repo's own trained homogeneous-GAT checkpoint fixture.

Builds a pure-torch GAT (PyG 2.0.4 ``GATConv`` semantics: shared src/dst
linear map, additive attention, leaky-relu(0.2), unit self-loops in the
softmax — the conv family of the reference's hetero test model,
``/root/reference/tests/test_utils.py:135``) + the reference's FC head
shape, trains it on the 36-node toy graph's labels, and saves a ``.pth.tar``
whose state dict uses the PyG key layout (``conv.0.lin_src.weight``,
``conv.0.att_src`` ...) so :mod:`models.torch_import.gat_node_model_params`
exercises the real import path.

Run: python scripts/make_gat_fixture.py
"""

import os

import numpy as np
import torch

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRAPH = os.path.join(HERE, "test_data", "toy_graph_36n.npz")
OUT = os.path.join(HERE, "test_data", "gat_homo_1hop_36n_own.pth.tar")

F_IN, C, FC = 84, 16, (16, 16, 32)


class TorchGAT(torch.nn.Module):
    """PyG-exact single-head GATConv + FC head, in PyG's state-dict layout."""

    def __init__(self):
        super().__init__()
        conv = torch.nn.Module()
        conv.lin_src = torch.nn.Linear(F_IN, C, bias=False)
        conv.att_src = torch.nn.Parameter(torch.empty(1, 1, C))
        conv.att_dst = torch.nn.Parameter(torch.empty(1, 1, C))
        conv.bias = torch.nn.Parameter(torch.zeros(C))
        torch.nn.init.xavier_uniform_(conv.lin_src.weight)
        torch.nn.init.xavier_uniform_(conv.att_src)
        torch.nn.init.xavier_uniform_(conv.att_dst)
        self.conv = torch.nn.ModuleList([conv])
        fcs = []
        dims = [*FC, 1]
        for a, b in zip(dims[:-1], dims[1:]):
            fcs.append(torch.nn.Linear(a, b))
            fcs.append(torch.nn.ReLU())
        fcs[-1] = torch.nn.Sigmoid()
        self.fc = torch.nn.ModuleList(fcs)

    def forward(self, x, edge_index):
        conv = self.conv[0]
        src, dst = edge_index
        n = x.shape[0]
        xs = conv.lin_src(x)  # [N, C]
        a_s = (xs * conv.att_src[0, 0]).sum(-1)
        a_d = (xs * conv.att_dst[0, 0]).sum(-1)
        # self-loops appended (PyG add_self_loops=True default)
        loop = torch.arange(n)
        src_f = torch.cat([src, loop])
        dst_f = torch.cat([dst, loop])
        logits = torch.nn.functional.leaky_relu(a_s[src_f] + a_d[dst_f], 0.2)
        # segment softmax over incoming edges
        m = torch.full((n,), -torch.inf).scatter_reduce(
            0, dst_f, logits, reduce="amax"
        )
        ex = torch.exp(logits - m[dst_f])
        den = torch.zeros(n).scatter_add_(0, dst_f, ex)
        alpha = ex / den[dst_f]
        out = torch.zeros(n, C).scatter_add_(
            0, dst_f.unsqueeze(1).expand(-1, C), alpha.unsqueeze(1) * xs[src_f]
        )
        h = out + conv.bias
        h = torch.relu(h)
        for mod in self.fc:
            h = mod(h)
        return h


def main():
    torch.manual_seed(7)
    data = np.load(GRAPH)
    feat = torch.tensor(data["feat"])
    ei = torch.tensor(data["edge_index"])
    y = torch.tensor(data["labels"].astype(np.float32)).unsqueeze(1)

    model = TorchGAT()
    opt = torch.optim.Adam(model.parameters(), lr=0.01)
    for step in range(400):
        opt.zero_grad()
        pred = model(feat, ei)
        loss = torch.nn.functional.binary_cross_entropy(pred, y)
        loss.backward()
        opt.step()
    with torch.no_grad():
        pred = model(feat, ei)
        acc = ((pred > 0.5) == (y > 0.5)).float().mean().item()
    print(f"final loss {loss.item():.4f} acc {acc:.3f}")

    torch.save({"model": model.state_dict(), "acc": acc}, OUT)
    print("saved", OUT)


if __name__ == "__main__":
    main()
