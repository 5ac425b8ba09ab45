"""Dataset explorer: embeddings table, similarity search, query filters
(modelled on the reference tests/test_explorer.py behaviors)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("expset")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        img = np.full((32, 32, 3), 20 * i, np.uint8)
        img[4:20, 4:20] = 255 - 20 * i
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        n = i % 3
        lines = [f"{j % 2} 0.5 0.5 0.4 0.4" for j in range(n)]
        (root / "labels" / f"{i}.txt").write_text("\n".join(lines))
    return root / "images"


@pytest.fixture(scope="module")
def explorer(dataset):
    from yolov10_3d_tpu.data.explorer import Explorer

    def embed(batch):
        # cheap deterministic embedding: channel-mean histogram
        b = batch.reshape(batch.shape[0], -1, 3)
        e = np.concatenate([b.mean(1), b.std(1)], -1)
        return e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)

    ex = Explorer(dataset, embed_fn=embed)
    n = ex.create_embeddings_table()
    assert n == 6
    return ex


def test_get_similar_by_index(explorer):
    rows = explorer.get_similar(idx=0, limit=3)
    assert len(rows) == 3
    assert rows[0]["im_file"].endswith("0.jpg")  # self is the best match
    assert rows[0]["similarity"] >= rows[1]["similarity"]


def test_get_similar_by_image(explorer, dataset):
    rows = explorer.get_similar(img=str(dataset / "2.jpg"), limit=2)
    assert rows[0]["im_file"].endswith("2.jpg")


def test_query(explorer):
    rows = explorer.query("n_labels >= 2")
    assert all(r["n_labels"] >= 2 for r in rows) and rows
    rows = explorer.query("1 in classes")
    assert all(1 in r["classes"] for r in rows) and rows


def test_similarity_index(explorer):
    si = explorer.similarity_index(top_k=2)
    assert len(si) == 6 and len(si[0]["similar"]) == 2


def test_model_embeddings(dataset):
    """End-to-end with real model features as the embedder."""
    from yolov10_3d_tpu.data.explorer import Explorer
    from yolov10_3d_tpu.engine.model import Model

    m = Model("yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml")
    ex = Explorer(dataset, model=m, imgsz=64)
    assert ex.create_embeddings_table() == 6
    rows = ex.get_similar(idx=1, limit=2)
    assert rows[0]["im_file"].endswith("1.jpg")


def test_sql_query(explorer):
    """Real SQL via sqlite3 (reference explorer.py:173 sql_query)."""
    rows = explorer.sql_query("WHERE n_labels >= 2")
    assert rows and all(r["n_labels"] >= 2 for r in rows)
    # full SELECT with the reference's quoted table name + LIKE over names
    rows = explorer.sql_query(
        "SELECT im_file, labels FROM 'table' WHERE labels LIKE '%0%'",
        names={0: "cls0", 1: "cls1"},
    )
    assert all("labels" in r for r in rows)
    # projection works
    rows = explorer.sql_query("SELECT im_file FROM 'table' WHERE n_labels = 0")
    assert rows and set(rows[0]) == {"im_file"}


def test_plot_sql_query(explorer):
    fig = explorer.plot_sql_query("WHERE n_labels >= 0")
    assert fig is not None


@pytest.fixture(scope="module")
def dash_server(explorer):
    """Dashboard on an ephemeral port; yields its base URL."""
    from yolov10_3d_tpu.data.explorer_dash import ExplorerDashboard

    dash = ExplorerDashboard(explorer, names={0: "cls0", 1: "cls1"})
    server = dash.serve(port=0, blocking=False)
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.server_close()


def _get(url):
    import urllib.request

    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_dash_front_page(dash_server):
    status, ctype, body = _get(dash_server + "/")
    assert status == 200 and "text/html" in ctype
    assert b"Dataset explorer" in body


def test_dash_sql_endpoint(dash_server):
    import json

    status, _, body = _get(dash_server + "/api/sql?q=WHERE+n_labels+%3E%3D+2")
    rows = json.loads(body)["rows"]
    assert status == 200 and rows and all(r["n_labels"] >= 2 for r in rows)
    # SQL errors surface as JSON, not a 500
    _, _, body = _get(dash_server + "/api/sql?q=SELEKT+broken")
    out = json.loads(body)
    assert out["rows"] == [] and "error" in out


def test_dash_similar_and_index(dash_server):
    import json

    _, _, body = _get(dash_server + "/api/files")
    files = json.loads(body)["files"]
    assert len(files) == 6
    from urllib.parse import quote

    _, _, body = _get(dash_server + f"/api/similar?img={quote(files[2])}&limit=3")
    rows = json.loads(body)["rows"]
    assert len(rows) == 3 and rows[0]["im_file"] == files[2]
    _, _, body = _get(dash_server + "/api/similar?idx=0&limit=2")
    assert len(json.loads(body)["rows"]) == 2
    _, _, body = _get(dash_server + "/api/index?top_k=2")
    rows = json.loads(body)["rows"]
    assert len(rows) == 6 and len(rows[0]["similar"]) == 2


def test_dash_image_serving_allowlist(dash_server):
    import json
    import urllib.error
    from urllib.parse import quote

    _, _, body = _get(dash_server + "/api/files")
    files = json.loads(body)["files"]
    status, ctype, body = _get(dash_server + f"/img?path={quote(files[0])}")
    assert status == 200 and ctype == "image/jpeg" and len(body) > 100
    # anything not in the table is refused (traversal guard)
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(dash_server + "/img?path=" + quote("/etc/passwd"))
    assert e.value.code == 404
