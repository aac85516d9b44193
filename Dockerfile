# bikg_graph_explainability_public_tpu — CPU image (TPU runtimes are
# provisioned by the accelerator platform; this image covers development,
# tests on the virtual-device mesh, and CPU-only usage).
#
# The reference ships a CUDA-pinned Dockerfile (torch 1.10 + PyG); this one
# needs only the JAX CPU wheel.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make git && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY bikg_graph_explainability_public_tpu ./bikg_graph_explainability_public_tpu
COPY config ./config
COPY tests ./tests
COPY bench.py ./

RUN pip install --no-cache-dir "jax[cpu]" numpy pandas scipy pytest torch \
    --extra-index-url https://download.pytorch.org/whl/cpu \
    && pip install --no-cache-dir -e .

# CI gate: the full test suite on an 8-virtual-device CPU mesh
RUN python -m pytest tests/ -q

ENTRYPOINT ["python", "-m", "bikg_graph_explainability_public_tpu.cli"]
