"""Dataset explorer: embeddings + similarity search + query filters
(reference: data/explorer/explorer.py — LanceDB + SQL + CLIP embedder).

Offline TPU-native redesign: embeddings are pooled backbone features from any
framework model (computed in jit-compiled batches), the vector index is a
dense normalized numpy matrix (exact cosine top-k — datasets at YOLO scale
fit comfortably in host RAM), and queries run through pandas instead of an
embedded SQL engine."""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Union

import numpy as np


class Explorer:
    """Build and query an embedding table over a YOLO-format dataset."""

    def __init__(
        self,
        data: Union[str, Path],
        model=None,
        embed_fn: Optional[Callable] = None,
        imgsz: int = 256,
    ):
        """data: images dir or dataset yaml; model: engine Model facade used
        for embeddings (pooled backbone features); embed_fn overrides with a
        custom (B, H, W, 3) float -> (B, D) callable."""
        self.data = Path(data)
        self.model = model
        self.embed_fn = embed_fn
        self.imgsz = imgsz
        self.table: Optional[Dict[str, np.ndarray]] = None

    # -- embedding ---------------------------------------------------------
    def _default_embed(self, batch: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        if self.embed_fn is not None:
            return np.asarray(self.embed_fn(batch))
        assert self.model is not None, "need a model or embed_fn"
        model, spec, variables = (
            self.model.model, self.model.spec, self.model.variables,
        )

        if not hasattr(self, "_jit_embed"):
            def f(v, x):
                feats = model.apply(v, x, train=False)
                if isinstance(feats, dict):
                    feats = feats.get("one2one", feats)
                # global-average-pool the coarsest map -> embedding
                f5 = feats[-1] if isinstance(feats, (list, tuple)) else feats
                e = f5.mean(axis=(1, 2))
                return e / jnp.maximum(
                    jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12
                )

            self._jit_embed = jax.jit(f)
        return np.asarray(self._jit_embed(variables, jnp.asarray(batch)))

    def _image_files(self) -> List[Path]:
        exts = {".jpg", ".jpeg", ".png", ".bmp"}
        root = self.data
        if root.suffix in (".yaml", ".yml"):
            import yaml

            d = yaml.safe_load(root.read_text())
            root = Path(d.get("path", root.parent)) / d.get("train", "images")
        return sorted(p for p in root.rglob("*") if p.suffix.lower() in exts)

    def create_embeddings_table(self, batch: int = 16) -> int:
        """Embed every image; returns the row count
        (reference explorer.py create_embeddings_table)."""
        from PIL import Image

        files = self._image_files()
        embs, metas = [], []
        for i in range(0, len(files), batch):
            chunk = files[i : i + batch]
            imgs = np.stack(
                [
                    np.asarray(
                        Image.open(p).convert("RGB").resize((self.imgsz, self.imgsz)),
                        np.float32,
                    )
                    / 255.0
                    for p in chunk
                ]
            )
            embs.append(self._default_embed(imgs))
            for p in chunk:
                lbl = self._label_path(p)
                classes = []
                if lbl.exists():
                    classes = [
                        int(line.split()[0])
                        for line in lbl.read_text().splitlines()
                        if line.strip()
                    ]
                metas.append((str(p), classes))
        vecs = (
            np.concatenate(embs) if embs else np.zeros((0, 1), np.float32)
        )
        self.table = {
            "vector": vecs,
            "im_file": np.asarray([m[0] for m in metas], object),
            "labels": [m[1] for m in metas],
        }
        return len(metas)

    @staticmethod
    def _label_path(img_path: Path) -> Path:
        s = str(img_path)
        return Path(
            s.replace("/images/", "/labels/").rsplit(".", 1)[0] + ".txt"
        )

    # -- querying ----------------------------------------------------------
    def _require_table(self):
        if self.table is None:
            raise RuntimeError("call create_embeddings_table() first")

    def get_similar(
        self, img: Optional[Union[str, np.ndarray]] = None,
        idx: Optional[int] = None, limit: int = 9,
    ):
        """Top-`limit` most similar rows by cosine similarity
        (reference explorer.py get_similar)."""
        from PIL import Image

        self._require_table()
        if idx is not None:
            q = self.table["vector"][idx]
        else:
            arr = (
                np.asarray(Image.open(img).convert("RGB").resize((self.imgsz, self.imgsz)), np.float32) / 255.0
                if isinstance(img, (str, Path))
                else np.asarray(img, np.float32)
            )
            q = self._default_embed(arr[None])[0]
        sims = self.table["vector"] @ q
        order = np.argsort(-sims)[:limit]
        return [
            {
                "im_file": self.table["im_file"][i],
                "similarity": float(sims[i]),
                "labels": self.table["labels"][i],
            }
            for i in order
        ]

    def query(self, expr: str, limit: int = 100):
        """Filter rows with a pandas expression over columns
        ``im_file``/``n_labels``/``classes`` (offline stand-in for the
        reference's SQL queries, e.g. "n_labels > 2 and 0 in classes")."""
        import pandas as pd

        self._require_table()
        df = pd.DataFrame(
            {
                "im_file": self.table["im_file"],
                "n_labels": [len(l) for l in self.table["labels"]],
                "classes": self.table["labels"],
            }
        )
        mask = df.apply(
            lambda row: bool(
                eval(  # noqa: S307 - trusted local analysis expression
                    expr, {"__builtins__": {}},
                    {"im_file": row.im_file, "n_labels": row.n_labels,
                     "classes": row.classes},
                )
            ),
            axis=1,
        )
        return df[mask].head(limit).to_dict("records")

    def sql_query(self, query: str, names: Optional[Dict[int, str]] = None,
                  limit: int = 100):
        """Real SQL over the embeddings table (reference explorer.py:173
        ``sql_query`` runs duckdb over LanceDB; offline we load the same
        columns into an in-memory stdlib sqlite3 table).

        Columns: ``im_file`` TEXT, ``labels`` TEXT (space-joined class names,
        so ``labels LIKE '%person%'`` works), ``n_labels`` INT, ``classes``
        TEXT (JSON int list). Accepts a full ``SELECT ... FROM 'table' ...``
        or a bare ``WHERE ...`` fragment, like the reference.
        """
        import json
        import sqlite3

        self._require_table()
        names = names or (getattr(self.model, "names", None) or {})
        con = sqlite3.connect(":memory:")
        con.execute(
            "CREATE TABLE 'table' (id INTEGER, im_file TEXT, labels TEXT, "
            "n_labels INTEGER, classes TEXT)"
        )
        rows = [
            (
                i,
                str(self.table["im_file"][i]),
                " ".join(str(names.get(c, c)) for c in self.table["labels"][i]),
                len(self.table["labels"][i]),
                json.dumps(self.table["labels"][i]),
            )
            for i in range(len(self.table["im_file"]))
        ]
        con.executemany("INSERT INTO 'table' VALUES (?,?,?,?,?)", rows)
        q = query.strip()
        if q.upper().startswith("WHERE"):
            q = f"SELECT * FROM 'table' {q}"
        cur = con.execute(q)
        cols = [d[0] for d in cur.description]
        out = [dict(zip(cols, r)) for r in cur.fetchmany(limit)]
        con.close()
        return out

    def plot_sql_query(self, query: str, names: Optional[Dict[int, str]] = None):
        """Image-grid figure of a SQL query's rows (reference
        explorer.py:219 ``plot_sql_query``). Returns a matplotlib figure."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from PIL import Image

        rows = self.sql_query(query, names=names, limit=16)
        n = max(len(rows), 1)
        cols = int(np.ceil(np.sqrt(n)))
        fig, axes = plt.subplots(
            int(np.ceil(n / cols)), cols, figsize=(3 * cols, 3 * np.ceil(n / cols))
        )
        for ax, row in zip(np.atleast_1d(axes).ravel(), rows):
            if "im_file" in row and Path(str(row["im_file"])).exists():
                ax.imshow(Image.open(row["im_file"]))
                ax.set_title(Path(str(row["im_file"])).name, fontsize=7)
            ax.axis("off")
        for ax in np.atleast_1d(axes).ravel()[len(rows):]:
            ax.axis("off")
        return fig

    def similarity_index(self, top_k: int = 5):
        """For each row, its most similar other rows — duplicate finder
        (reference explorer.py similarity_index)."""
        self._require_table()
        v = self.table["vector"]
        sims = v @ v.T
        np.fill_diagonal(sims, -np.inf)
        idx = np.argsort(-sims, axis=1)[:, :top_k]
        return [
            {
                "im_file": self.table["im_file"][i],
                "similar": [self.table["im_file"][j] for j in idx[i]],
                "scores": [float(sims[i, j]) for j in idx[i]],
            }
            for i in range(len(v))
        ]


def explorer_gui(explorer: "Explorer", server_port: int = 7861, launch: bool = True):
    """Dataset-explorer web GUI (reference explorer/gui/dash.py:268 — a
    streamlit dashboard; ours is a gradio Blocks app, matching app.py's
    stack). Gated on gradio importability: query box -> filtered grid,
    image picker -> nearest-neighbor grid, similarity-index table.
    Returns the Blocks app (launched when ``launch``)."""
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            f"explorer_gui requires gradio (not installed in this image): {e}"
        )

    explorer._require_table()
    files = [str(f) for f in explorer._image_files()]

    def run_query(expr):
        rows = explorer.query(expr) if expr.strip() else []
        return [r["im_file"] for r in rows][:32]

    def run_similar(path):
        rows = explorer.get_similar(img=path, limit=9)
        return [r["im_file"] for r in rows]

    def run_index():
        idx = explorer.similarity_index()
        return [[r["im_file"], ", ".join(Path(p).name for p in r["similar"])]
                for r in idx[:50]]

    with gr.Blocks(title="yolov10-3d-tpu explorer") as demo:
        gr.Markdown("## Dataset explorer — embeddings search + pandas query")
        with gr.Row():
            q = gr.Textbox(label="query (pandas expr over labels)",
                           placeholder="labels.str.contains('person')")
            btn = gr.Button("Run")
        grid = gr.Gallery(label="results", columns=8)
        btn.click(run_query, q, grid)
        with gr.Row():
            pick = gr.Dropdown(files, label="similar-to image")
            sim_btn = gr.Button("Find similar")
        sim_grid = gr.Gallery(label="nearest neighbors", columns=3)
        sim_btn.click(run_similar, pick, sim_grid)
        idx_btn = gr.Button("Similarity index")
        idx_tbl = gr.Dataframe(headers=["image", "nearest"], label="index")
        idx_btn.click(run_index, None, idx_tbl)
    if launch:
        demo.launch(server_port=server_port)
    return demo
