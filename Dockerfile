# Serve bark-tpu over HTTP with the browser demo — the counterpart of the
# reference's 2-stage emsdk+nginx Dockerfile (its WASM demo). Here the model
# runs server-side (CPU in this image; point JAX at a TPU runtime for real
# serving) and examples/web is the thin client.
#
#   docker build -t bark-tpu .
#   docker run -p 8080:8080 -v /path/to/weights:/models bark-tpu \
#       -m /models/ggml_weights.bin
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY bark_tpu ./bark_tpu
COPY native ./native
COPY examples/web ./examples/web

RUN pip install --no-cache-dir "jax[cpu]" numpy && \
    pip install --no-cache-dir -e . && \
    make -C native

EXPOSE 8080
ENTRYPOINT ["python", "-m", "bark_tpu.cli.server", \
            "-H", "0.0.0.0", "-P", "8080", "--web", "examples/web"]
CMD ["-m", "/models/ggml_weights.bin"]
