# Inference service image (reference: inference/docker/Dockerfile).
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml ./
COPY twotowers_tpu ./twotowers_tpu

RUN pip install --no-cache-dir .[serve] \
    && pip install --no-cache-dir jax  # CPU jax in the container; TPU hosts mount their own

ENV PORT=8080
EXPOSE 8080
CMD ["python", "-m", "twotowers_tpu.serve.app"]
