"""Triton inference-server client (reference: utils/triton.py
``TritonRemoteModel`` — HTTP/gRPC remote model wrapper)."""

from __future__ import annotations

from typing import List, Optional
from urllib.parse import urlsplit

import numpy as np


class TritonRemoteModel:
    """Thin client over tritonclient (optional dependency): call with numpy
    arrays, get numpy outputs. URL forms: http://host:8000/model or
    grpc://host:8001/model."""

    def __init__(self, url: str, endpoint: str = "", scheme: str = ""):
        if not endpoint and not scheme:
            parts = urlsplit(url)
            endpoint = parts.path.strip("/").split("/")[0]
            scheme = parts.scheme
            url = parts.netloc
        self.endpoint = endpoint
        self.url = url
        if scheme == "http":
            import tritonclient.http as client

            self._client = client.InferenceServerClient(url=url, verbose=False)
            config = self._client.get_model_config(endpoint)
        else:
            import tritonclient.grpc as client

            self._client = client.InferenceServerClient(url=url, verbose=False)
            config = self._client.get_model_config(endpoint, as_json=True)["config"]
        self._client_mod = client
        config["output"] = sorted(config["output"], key=lambda x: x.get("name", ""))
        self.input_names = [x["name"] for x in config["input"]]
        self.input_formats = [x["data_type"] for x in config["input"]]
        self.output_names = [x["name"] for x in config["output"]]
        self.np_input_formats = [
            {"TYPE_FP32": np.float32, "TYPE_FP16": np.float16, "TYPE_UINT8": np.uint8}.get(
                f, np.float32
            )
            for f in self.input_formats
        ]

    def __call__(self, *inputs: np.ndarray) -> List[np.ndarray]:
        infer_inputs = []
        for i, x in enumerate(inputs):
            x = x.astype(self.np_input_formats[i])
            ii = self._client_mod.InferInput(
                self.input_names[i], list(x.shape),
                self.input_formats[i].replace("TYPE_", ""),
            )
            ii.set_data_from_numpy(x)
            infer_inputs.append(ii)
        outputs = [self._client_mod.InferRequestedOutput(n) for n in self.output_names]
        result = self._client.infer(
            model_name=self.endpoint, inputs=infer_inputs, outputs=outputs
        )
        return [result.as_numpy(n) for n in self.output_names]
