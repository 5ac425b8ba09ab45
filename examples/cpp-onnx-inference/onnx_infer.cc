// onnx_infer.cc — self-contained C++17 ONNX inference client for models
// exported by yolov10_3d_tpu's jaxpr->ONNX translator (nn/onnx_export.py).
//
// TPU-native counterpart of the reference's C++ deployment examples
// (reference: examples/YOLOv8-CPP-Inference/inference.cpp,
// examples/YOLOv8-ONNXRuntime-CPP/src/inference.cpp) — but with zero
// external dependencies: the ONNX protobuf wire format is parsed by hand
// (same message subset as nn/onnx_wire.py) and the op set interpreted
// directly (same vocabulary as nn/onnx_runtime.py). Accepts .npy tensors
// or a P6 .ppm image (letterbox preprocess + detection printout, the
// NMS-free v10 epilogue being baked into the exported graph).
//
// Build:  g++ -O2 -std=c++17 -fopenmp onnx_infer.cc -o onnx_infer
// Usage:  onnx_infer model.onnx input.npy  [--out prefix] [--repeat N]
//         onnx_infer model.onnx image.ppm  [--conf 0.25]

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <memory>
#include <numeric>
#include <sstream>
#include <stdexcept>
#include <string>
#include <unordered_map>
#include <vector>
#include <chrono>

// ---------------------------------------------------------------- tensors
// ONNX TensorProto.DataType codes we support (matches nn/onnx_wire.py).
enum DT : int { F32 = 1, U8 = 2, I8 = 3, I32 = 6, I64 = 7, BOOL = 9, F64 = 11 };

static size_t dt_size(int dt) {
  switch (dt) {
    case F32: case I32: return 4;
    case F64: case I64: return 8;
    case U8: case I8: case BOOL: return 1;
  }
  throw std::runtime_error("unsupported dtype " + std::to_string(dt));
}

struct Tensor {
  int dt = F32;
  std::vector<int64_t> shape;
  std::shared_ptr<std::vector<uint8_t>> buf;

  Tensor() : buf(std::make_shared<std::vector<uint8_t>>()) {}
  Tensor(int dtype, std::vector<int64_t> shp) : dt(dtype), shape(std::move(shp)) {
    buf = std::make_shared<std::vector<uint8_t>>(numel() * dt_size(dt));
  }
  int64_t numel() const {
    int64_t n = 1;
    for (auto d : shape) n *= d;
    return n;
  }
  template <class T> T* ptr() { return reinterpret_cast<T*>(buf->data()); }
  template <class T> const T* ptr() const { return reinterpret_cast<const T*>(buf->data()); }
  // read element i as double (for generic float paths)
  double getf(int64_t i) const {
    switch (dt) {
      case F32: return ptr<float>()[i];
      case F64: return ptr<double>()[i];
      case I32: return ptr<int32_t>()[i];
      case I64: return (double)ptr<int64_t>()[i];
      case U8:  return ptr<uint8_t>()[i];
      case I8:  return ptr<int8_t>()[i];
      case BOOL: return ptr<uint8_t>()[i] != 0;
    }
    throw std::runtime_error("getf: bad dtype");
  }
  int64_t geti(int64_t i) const {
    switch (dt) {
      case I64: return ptr<int64_t>()[i];
      case I32: return ptr<int32_t>()[i];
      case U8: case BOOL: return ptr<uint8_t>()[i];
      case I8: return ptr<int8_t>()[i];
      case F32: return (int64_t)ptr<float>()[i];
      case F64: return (int64_t)ptr<double>()[i];
    }
    throw std::runtime_error("geti: bad dtype");
  }
  void setf(int64_t i, double v) {
    switch (dt) {
      case F32: ptr<float>()[i] = (float)v; return;
      case F64: ptr<double>()[i] = v; return;
      case I32: ptr<int32_t>()[i] = (int32_t)v; return;
      case I64: ptr<int64_t>()[i] = (int64_t)v; return;
      case U8:  ptr<uint8_t>()[i] = (uint8_t)v; return;
      case I8:  ptr<int8_t>()[i] = (int8_t)v; return;
      case BOOL: ptr<uint8_t>()[i] = v != 0; return;
    }
    throw std::runtime_error("setf: bad dtype");
  }
  bool is_float() const { return dt == F32 || dt == F64; }
};

static std::vector<int64_t> row_strides(const std::vector<int64_t>& shape) {
  std::vector<int64_t> s(shape.size(), 1);
  for (int i = (int)shape.size() - 2; i >= 0; --i) s[i] = s[i + 1] * shape[i + 1];
  return s;
}

// NumPy-style multidirectional broadcast of two shapes.
static std::vector<int64_t> broadcast_shape(const std::vector<int64_t>& a,
                                            const std::vector<int64_t>& b) {
  size_t r = std::max(a.size(), b.size());
  std::vector<int64_t> out(r);
  for (size_t i = 0; i < r; ++i) {
    int64_t da = i < r - a.size() ? 1 : a[i - (r - a.size())];
    int64_t db = i < r - b.size() ? 1 : b[i - (r - b.size())];
    if (da != db && da != 1 && db != 1)
      throw std::runtime_error("broadcast mismatch");
    out[i] = std::max(da, db);
  }
  return out;
}

// Strides of `shape` aligned to broadcast rank `r` (0 where broadcast).
static std::vector<int64_t> bcast_strides(const std::vector<int64_t>& shape,
                                          size_t r) {
  auto st = row_strides(shape);
  std::vector<int64_t> out(r, 0);
  size_t off = r - shape.size();
  for (size_t i = 0; i < shape.size(); ++i)
    out[off + i] = shape[i] == 1 ? 0 : st[i];
  return out;
}

// Iterate a broadcast output: calls fn(out_flat, a_off, b_off).
template <class F>
static void bcast_iter(const std::vector<int64_t>& oshape,
                       const std::vector<int64_t>& sa,
                       const std::vector<int64_t>& sb, F fn) {
  size_t r = oshape.size();
  int64_t total = 1;
  for (auto d : oshape) total *= d;
  std::vector<int64_t> coord(r, 0);
  int64_t oa = 0, ob = 0;
  for (int64_t i = 0; i < total; ++i) {
    fn(i, oa, ob);
    for (int ax = (int)r - 1; ax >= 0; --ax) {
      coord[ax]++;
      oa += sa[ax];
      ob += sb[ax];
      if (coord[ax] < oshape[ax]) break;
      oa -= sa[ax] * oshape[ax];
      ob -= sb[ax] * oshape[ax];
      coord[ax] = 0;
    }
  }
}

// -------------------------------------------------------- protobuf decoder
// Mirrors nn/onnx_wire.py: varint tags + length-delimited submessages for
// ModelProto/GraphProto/NodeProto/TensorProto/AttributeProto/ValueInfoProto.
struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  Reader(const uint8_t* d, size_t n) : p(d), end(d + n) {}
  bool done() const { return p >= end; }
  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (true) {
      if (p >= end) throw std::runtime_error("truncated varint");
      uint8_t b = *p++;
      v |= (uint64_t)(b & 0x7F) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
    }
  }
  // returns field number; sets wire type and payload (for wt 2) or value
  struct Field {
    int num;
    int wt;
    uint64_t ival;            // wt 0
    const uint8_t* data = nullptr;  // wt 2/5/1
    size_t len = 0;
  };
  Field field() {
    Field f;
    uint64_t tag = varint();
    f.num = (int)(tag >> 3);
    f.wt = (int)(tag & 7);
    if (f.wt == 0) {
      f.ival = varint();
    } else if (f.wt == 2) {
      size_t ln = (size_t)varint();
      f.data = p;
      f.len = ln;
      p += ln;
    } else if (f.wt == 5) {
      f.data = p;
      f.len = 4;
      p += 4;
    } else if (f.wt == 1) {
      f.data = p;
      f.len = 8;
      p += 8;
    } else {
      throw std::runtime_error("bad wire type");
    }
    if (p > end) throw std::runtime_error("truncated field");
    return f;
  }
};

static int64_t signed64(uint64_t v) { return (int64_t)v; }

static std::vector<int64_t> packed_i64(const Reader::Field& f) {
  std::vector<int64_t> out;
  if (f.wt == 0) {
    out.push_back(signed64(f.ival));
  } else {
    Reader r(f.data, f.len);
    while (!r.done()) out.push_back(signed64(r.varint()));
  }
  return out;
}

struct Attr {
  // typed union: 1=float 2=int 3=string 6=floats 7=ints
  int type = 0;
  double f = 0;
  int64_t i = 0;
  std::string s;
  std::vector<double> floats;
  std::vector<int64_t> ints;
};

struct Node {
  std::string op;
  std::string name;
  std::vector<std::string> inputs, outputs;
  std::map<std::string, Attr> attrs;
  int64_t attr_i(const std::string& k, int64_t dflt) const {
    auto it = attrs.find(k);
    return it == attrs.end() ? dflt : it->second.i;
  }
  std::vector<int64_t> attr_ints(const std::string& k,
                                 std::vector<int64_t> dflt) const {
    auto it = attrs.find(k);
    if (it == attrs.end()) return dflt;
    if (it->second.type == 2) return {it->second.i};
    return it->second.ints;
  }
};

struct ValueInfo {
  std::string name;
  int elem_type = F32;
  std::vector<int64_t> shape;  // -1 for symbolic dims
};

struct Graph {
  std::string name;
  std::vector<Node> nodes;
  std::vector<ValueInfo> inputs, outputs;
  std::unordered_map<std::string, Tensor> initializers;
};

struct Model {
  Graph graph;
  int64_t opset = 13;
  std::map<std::string, std::string> metadata;
};

static Tensor decode_tensor(const uint8_t* d, size_t n) {
  Reader r(d, n);
  std::vector<int64_t> dims;
  int dtype = F32;
  std::string name;
  const uint8_t* raw = nullptr;
  size_t rawlen = 0;
  std::vector<double> float_data;
  std::vector<int64_t> int_data;
  while (!r.done()) {
    auto f = r.field();
    if (f.num == 1) {
      auto v = packed_i64(f);
      dims.insert(dims.end(), v.begin(), v.end());
    } else if (f.num == 2) {
      dtype = (int)f.ival;
    } else if (f.num == 8) {
      name.assign((const char*)f.data, f.len);
    } else if (f.num == 9) {
      raw = f.data;
      rawlen = f.len;
    } else if (f.num == 4) {  // packed float_data
      if (f.wt == 5) {
        float fv;
        std::memcpy(&fv, f.data, 4);
        float_data.push_back(fv);
      } else {
        for (size_t i = 0; i + 4 <= f.len; i += 4) {
          float fv;
          std::memcpy(&fv, f.data + i, 4);
          float_data.push_back(fv);
        }
      }
    } else if (f.num == 5 || f.num == 7) {  // int32_data / int64_data
      auto v = packed_i64(f);
      int_data.insert(int_data.end(), v.begin(), v.end());
    }
  }
  Tensor t(dtype, dims);
  if (raw) {
    if (rawlen != t.buf->size()) throw std::runtime_error("raw_data size mismatch for " + name);
    std::memcpy(t.buf->data(), raw, rawlen);
  } else if (!float_data.empty()) {
    for (size_t i = 0; i < float_data.size(); ++i) t.setf(i, float_data[i]);
  } else {
    for (size_t i = 0; i < int_data.size(); ++i) t.setf(i, (double)int_data[i]);
  }
  return t;
}

static std::pair<std::string, Attr> decode_attr(const uint8_t* d, size_t n) {
  Reader r(d, n);
  std::string name;
  Attr a;
  bool has_i = false, has_f = false, has_s = false;
  while (!r.done()) {
    auto f = r.field();
    switch (f.num) {
      case 1: name.assign((const char*)f.data, f.len); break;
      case 2: {
        float fv;
        std::memcpy(&fv, f.data, 4);
        a.f = fv;
        has_f = true;
        break;
      }
      case 3: a.i = signed64(f.ival); has_i = true; break;
      case 4: a.s.assign((const char*)f.data, f.len); has_s = true; break;
      case 7:
        if (f.wt == 5) {
          float fv;
          std::memcpy(&fv, f.data, 4);
          a.floats.push_back(fv);
        } else {
          for (size_t i = 0; i + 4 <= f.len; i += 4) {
            float fv;
            std::memcpy(&fv, f.data + i, 4);
            a.floats.push_back(fv);
          }
        }
        break;
      case 8: {
        auto v = packed_i64(f);
        a.ints.insert(a.ints.end(), v.begin(), v.end());
        break;
      }
      case 20: a.type = (int)f.ival; break;
      default: break;  // tensors-in-attrs unused by our exporter
    }
  }
  if (a.type == 0) {  // untyped: infer like onnx_wire.decode_attribute
    if (has_i) a.type = 2;
    else if (has_f) a.type = 1;
    else if (has_s) a.type = 3;
    else if (!a.ints.empty()) a.type = 7;
    else a.type = 6;
  }
  return {name, a};
}

static Node decode_node(const uint8_t* d, size_t n) {
  Reader r(d, n);
  Node node;
  while (!r.done()) {
    auto f = r.field();
    if (f.num == 1) node.inputs.emplace_back((const char*)f.data, f.len);
    else if (f.num == 2) node.outputs.emplace_back((const char*)f.data, f.len);
    else if (f.num == 3) node.name.assign((const char*)f.data, f.len);
    else if (f.num == 4) node.op.assign((const char*)f.data, f.len);
    else if (f.num == 5) node.attrs.insert(decode_attr(f.data, f.len));
  }
  return node;
}

static ValueInfo decode_value_info(const uint8_t* d, size_t n) {
  Reader r(d, n);
  ValueInfo vi;
  while (!r.done()) {
    auto f = r.field();
    if (f.num == 1) {
      vi.name.assign((const char*)f.data, f.len);
    } else if (f.num == 2) {  // TypeProto
      Reader r2(f.data, f.len);
      while (!r2.done()) {
        auto f2 = r2.field();
        if (f2.num != 1) continue;  // tensor_type
        Reader r3(f2.data, f2.len);
        while (!r3.done()) {
          auto f3 = r3.field();
          if (f3.num == 1) {
            vi.elem_type = (int)f3.ival;
          } else if (f3.num == 2) {  // TensorShapeProto
            Reader r4(f3.data, f3.len);
            while (!r4.done()) {
              auto f4 = r4.field();
              if (f4.num != 1) continue;  // dim
              Reader r5(f4.data, f4.len);
              int64_t dim = -1;
              while (!r5.done()) {
                auto f5 = r5.field();
                if (f5.num == 1 && f5.wt == 0) dim = signed64(f5.ival);
                // f5.num == 2 is dim_param (symbolic) -> keep -1
              }
              vi.shape.push_back(dim);
            }
          }
        }
      }
    }
  }
  return vi;
}

static Model decode_model(const std::vector<uint8_t>& bytes) {
  Reader r(bytes.data(), bytes.size());
  Model m;
  while (!r.done()) {
    auto f = r.field();
    if (f.num == 7) {  // GraphProto
      Reader g(f.data, f.len);
      while (!g.done()) {
        auto fg = g.field();
        if (fg.num == 1) m.graph.nodes.push_back(decode_node(fg.data, fg.len));
        else if (fg.num == 2) m.graph.name.assign((const char*)fg.data, fg.len);
        else if (fg.num == 5) {
          Tensor t = decode_tensor(fg.data, fg.len);
          // name is parsed inside; re-parse for the key
          Reader tr(fg.data, fg.len);
          std::string nm;
          while (!tr.done()) {
            auto tf = tr.field();
            if (tf.num == 8) nm.assign((const char*)tf.data, tf.len);
          }
          m.graph.initializers.emplace(nm, std::move(t));
        } else if (fg.num == 11) m.graph.inputs.push_back(decode_value_info(fg.data, fg.len));
        else if (fg.num == 12) m.graph.outputs.push_back(decode_value_info(fg.data, fg.len));
      }
    } else if (f.num == 8) {  // opset_import
      Reader o(f.data, f.len);
      std::string dom;
      int64_t ver = 13;
      while (!o.done()) {
        auto fo = o.field();
        if (fo.num == 1) dom.assign((const char*)fo.data, fo.len);
        else if (fo.num == 2) ver = signed64(fo.ival);
      }
      if (dom.empty() || dom == "ai.onnx") m.opset = ver;
    } else if (f.num == 14) {  // metadata_props
      Reader o(f.data, f.len);
      std::string k, v;
      while (!o.done()) {
        auto fo = o.field();
        if (fo.num == 1) k.assign((const char*)fo.data, fo.len);
        else if (fo.num == 2) v.assign((const char*)fo.data, fo.len);
      }
      m.metadata[k] = v;
    }
  }
  return m;
}

// ------------------------------------------------------------------ npy IO
static Tensor load_npy(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "\x93NUMPY", 6) != 0)
    throw std::runtime_error(path + ": not a .npy file");
  uint8_t ver[2];
  f.read((char*)ver, 2);
  uint32_t hlen = 0;
  if (ver[0] == 1) {
    uint16_t h16;
    f.read((char*)&h16, 2);
    hlen = h16;
  } else {
    f.read((char*)&hlen, 4);
  }
  std::string header(hlen, '\0');
  f.read(header.data(), hlen);
  auto find_val = [&](const std::string& key) -> std::string {
    auto p = header.find("'" + key + "'");
    if (p == std::string::npos) throw std::runtime_error("npy: missing " + key);
    p = header.find(':', p) + 1;
    while (p < header.size() && header[p] == ' ') ++p;
    size_t e = p;
    if (header[p] == '\'') {
      e = header.find('\'', p + 1) + 1;
    } else if (header[p] == '(') {
      e = header.find(')', p) + 1;
    } else {
      while (e < header.size() && header[e] != ',' && header[e] != '}') ++e;
    }
    return header.substr(p, e - p);
  };
  std::string descr = find_val("descr");
  std::string shape_s = find_val("shape");
  bool fortran = find_val("fortran_order").find("True") != std::string::npos;
  if (fortran) throw std::runtime_error("npy: fortran order unsupported");
  std::vector<int64_t> shape;
  for (size_t i = 0; i < shape_s.size();) {
    if (isdigit(shape_s[i])) {
      size_t j = i;
      while (j < shape_s.size() && isdigit(shape_s[j])) ++j;
      shape.push_back(std::stoll(shape_s.substr(i, j - i)));
      i = j;
    } else {
      ++i;
    }
  }
  int dt;
  if (descr.find("f4") != std::string::npos) dt = F32;
  else if (descr.find("f8") != std::string::npos) dt = F64;
  else if (descr.find("i8") != std::string::npos) dt = I64;
  else if (descr.find("i4") != std::string::npos) dt = I32;
  else if (descr.find("u1") != std::string::npos) dt = U8;
  else if (descr.find("b1") != std::string::npos) dt = BOOL;
  else throw std::runtime_error("npy: unsupported descr " + descr);
  if (descr.find('>') != std::string::npos)
    throw std::runtime_error("npy: big-endian unsupported");
  Tensor t(dt, shape);
  f.read((char*)t.buf->data(), t.buf->size());
  if (!f) throw std::runtime_error("npy: truncated data");
  return t;
}

static void save_npy(const std::string& path, const Tensor& t) {
  const char* descr;
  switch (t.dt) {
    case F32: descr = "<f4"; break;
    case F64: descr = "<f8"; break;
    case I64: descr = "<i8"; break;
    case I32: descr = "<i4"; break;
    case U8: descr = "|u1"; break;
    case BOOL: descr = "|b1"; break;
    default: throw std::runtime_error("save_npy: bad dtype");
  }
  std::ostringstream hs;
  hs << "{'descr': '" << descr << "', 'fortran_order': False, 'shape': (";
  for (size_t i = 0; i < t.shape.size(); ++i) hs << t.shape[i] << (t.shape.size() == 1 ? "," : i + 1 < t.shape.size() ? ", " : "");
  hs << "), }";
  std::string header = hs.str();
  size_t total = 10 + header.size() + 1;
  size_t pad = (64 - total % 64) % 64;
  header += std::string(pad, ' ');
  header += '\n';
  std::ofstream f(path, std::ios::binary);
  f.write("\x93NUMPY\x01\x00", 8);
  uint16_t hlen = (uint16_t)header.size();
  f.write((char*)&hlen, 2);
  f.write(header.data(), header.size());
  f.write((const char*)t.buf->data(), t.buf->size());
}

// ------------------------------------------------------------- op kernels

static Tensor transpose(const Tensor& x, const std::vector<int64_t>& perm) {
  size_t r = x.shape.size();
  std::vector<int64_t> oshape(r);
  for (size_t i = 0; i < r; ++i) oshape[i] = x.shape[perm[i]];
  Tensor out(x.dt, oshape);
  auto xst = row_strides(x.shape);
  std::vector<int64_t> pst(r);
  for (size_t i = 0; i < r; ++i) pst[i] = xst[perm[i]];
  size_t es = dt_size(x.dt);
  const uint8_t* src = x.buf->data();
  uint8_t* dst = out.buf->data();
  std::vector<int64_t> coord(r, 0);
  int64_t xoff = 0;
  int64_t total = out.numel();
  for (int64_t i = 0; i < total; ++i) {
    std::memcpy(dst + i * es, src + xoff * es, es);
    for (int ax = (int)r - 1; ax >= 0; --ax) {
      coord[ax]++;
      xoff += pst[ax];
      if (coord[ax] < oshape[ax]) break;
      xoff -= pst[ax] * oshape[ax];
      coord[ax] = 0;
    }
  }
  return out;
}

// Conv: x (N,C,H,W), w (O,C/g,kh,kw), NCHW. Double accumulation.
static Tensor conv(const Tensor& x, const Tensor& w, const Tensor* b,
                   std::vector<int64_t> pads, std::vector<int64_t> strides,
                   std::vector<int64_t> dil, int64_t group) {
  int64_t n = x.shape[0], c = x.shape[1], h = x.shape[2], wd = x.shape[3];
  int64_t o = w.shape[0], cg = w.shape[1], kh = w.shape[2], kw = w.shape[3];
  int64_t ph0 = pads[0], pw0 = pads[1], ph1 = pads[2], pw1 = pads[3];
  int64_t sh = strides[0], sw = strides[1], dh = dil[0], dw = dil[1];
  int64_t oh = (h + ph0 + ph1 - (kh - 1) * dh - 1) / sh + 1;
  int64_t ow = (wd + pw0 + pw1 - (kw - 1) * dw - 1) / sw + 1;
  int64_t og = o / group;
  Tensor out(F32, {n, o, oh, ow});
  const float* X = x.ptr<float>();
  const float* W_ = w.ptr<float>();
  float* O_ = out.ptr<float>();
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t ni = 0; ni < n; ++ni)
    for (int64_t oc = 0; oc < o; ++oc) {
      int64_t g = oc / og;
      double bias = b ? b->getf(oc) : 0.0;
      for (int64_t yi = 0; yi < oh; ++yi)
        for (int64_t xi = 0; xi < ow; ++xi) {
          double acc = bias;
          for (int64_t ci = 0; ci < cg; ++ci) {
            int64_t ic = g * cg + ci;
            const float* xrow = X + ((ni * c + ic) * h) * wd;
            const float* wrow = W_ + ((oc * cg + ci) * kh) * kw;
            for (int64_t i = 0; i < kh; ++i) {
              int64_t iy = yi * sh - ph0 + i * dh;
              if (iy < 0 || iy >= h) continue;
              for (int64_t j = 0; j < kw; ++j) {
                int64_t ix = xi * sw - pw0 + j * dw;
                if (ix < 0 || ix >= wd) continue;
                acc += (double)xrow[iy * wd + ix] * wrow[i * kw + j];
              }
            }
          }
          O_[((ni * o + oc) * oh + yi) * ow + xi] = (float)acc;
        }
    }
  return out;
}

static Tensor maxpool(const Tensor& x, std::vector<int64_t> kernel,
                      std::vector<int64_t> strides, std::vector<int64_t> pads) {
  int64_t n = x.shape[0], c = x.shape[1], h = x.shape[2], wd = x.shape[3];
  int64_t kh = kernel[0], kw = kernel[1], sh = strides[0], sw = strides[1];
  int64_t ph0 = pads[0], pw0 = pads[1], ph1 = pads[2], pw1 = pads[3];
  int64_t oh = (h + ph0 + ph1 - kh) / sh + 1;
  int64_t ow = (wd + pw0 + pw1 - kw) / sw + 1;
  Tensor out(x.dt, {n, c, oh, ow});
  const float* X = x.ptr<float>();
  float* O_ = out.ptr<float>();
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t ni = 0; ni < n; ++ni)
    for (int64_t ci = 0; ci < c; ++ci) {
      const float* plane = X + (ni * c + ci) * h * wd;
      for (int64_t yi = 0; yi < oh; ++yi)
        for (int64_t xi = 0; xi < ow; ++xi) {
          float best = -std::numeric_limits<float>::infinity();
          for (int64_t i = 0; i < kh; ++i) {
            int64_t iy = yi * sh - ph0 + i;
            if (iy < 0 || iy >= h) continue;
            for (int64_t j = 0; j < kw; ++j) {
              int64_t ix = xi * sw - pw0 + j;
              if (ix < 0 || ix >= wd) continue;
              best = std::max(best, plane[iy * wd + ix]);
            }
          }
          O_[((ni * c + ci) * oh + yi) * ow + xi] = best;
        }
    }
  return out;
}

enum class BinOp { Add, Sub, Mul, Div, Max, Min, Pow, Mod, FMod,
                   And, Or, Xor, Eq, Gt, Lt, Ge, Le };

static bool is_cmp(BinOp op) {
  return op == BinOp::Eq || op == BinOp::Gt || op == BinOp::Lt ||
         op == BinOp::Ge || op == BinOp::Le || op == BinOp::And ||
         op == BinOp::Or || op == BinOp::Xor;
}

static Tensor binary(const Tensor& a, const Tensor& b, BinOp op) {
  auto oshape = broadcast_shape(a.shape, b.shape);
  size_t r = oshape.size();
  auto sa = bcast_strides(a.shape, r), sb = bcast_strides(b.shape, r);
  int odt = is_cmp(op) ? BOOL : (a.is_float() || b.is_float()
                                     ? (a.dt == F64 || b.dt == F64 ? F64 : F32)
                                     : (a.dt == I64 || b.dt == I64 ? I64 : a.dt));
  Tensor out(odt, oshape);
  bool int_arith = !a.is_float() && !b.is_float() && !is_cmp(op);
  bcast_iter(oshape, sa, sb, [&](int64_t oi, int64_t ia, int64_t ib) {
    if (int_arith) {
      int64_t x = a.geti(ia), y = b.geti(ib), v = 0;
      switch (op) {
        case BinOp::Add: v = x + y; break;
        case BinOp::Sub: v = x - y; break;
        case BinOp::Mul: v = x * y; break;
        case BinOp::Div: v = x / y; break;  // C++ / truncates toward zero = ONNX Div
        case BinOp::Max: v = std::max(x, y); break;
        case BinOp::Min: v = std::min(x, y); break;
        case BinOp::Pow: { v = 1; for (int64_t k = 0; k < y; ++k) v *= x; break; }
        case BinOp::Mod: { v = ((x % y) + y) % y; break; }  // python-mod
        case BinOp::FMod: v = x % y; break;
        default: throw std::runtime_error("int binop");
      }
      out.setf(oi, (double)v);
    } else {
      double x = a.getf(ia), y = b.getf(ib);
      double v = 0;
      switch (op) {
        case BinOp::Add: v = x + y; break;
        case BinOp::Sub: v = x - y; break;
        case BinOp::Mul: v = x * y; break;
        case BinOp::Div: v = x / y; break;
        case BinOp::Max: v = std::max(x, y); break;
        case BinOp::Min: v = std::min(x, y); break;
        case BinOp::Pow: v = std::pow(x, y); break;
        case BinOp::Mod: v = x - std::floor(x / y) * y; break;
        case BinOp::FMod: v = std::fmod(x, y); break;
        case BinOp::And: v = (x != 0) && (y != 0); break;
        case BinOp::Or: v = (x != 0) || (y != 0); break;
        case BinOp::Xor: v = (x != 0) != (y != 0); break;
        case BinOp::Eq: v = x == y; break;
        case BinOp::Gt: v = x > y; break;
        case BinOp::Lt: v = x < y; break;
        case BinOp::Ge: v = x >= y; break;
        case BinOp::Le: v = x <= y; break;
      }
      out.setf(oi, v);
    }
  });
  return out;
}

static Tensor where_op(const Tensor& c, const Tensor& a, const Tensor& b) {
  auto os = broadcast_shape(broadcast_shape(c.shape, a.shape), b.shape);
  size_t r = os.size();
  auto sc = bcast_strides(c.shape, r), sa = bcast_strides(a.shape, r),
       sb = bcast_strides(b.shape, r);
  Tensor out(a.dt, os);
  int64_t total = out.numel();
  std::vector<int64_t> coord(r, 0);
  int64_t oc = 0, oa = 0, ob = 0;
  size_t es = dt_size(a.dt);
  const uint8_t* A = a.buf->data();
  const uint8_t* B = b.buf->data();
  uint8_t* O_ = out.buf->data();
  for (int64_t i = 0; i < total; ++i) {
    bool cond = c.geti(oc) != 0;
    std::memcpy(O_ + i * es, (cond ? A + oa * es : B + ob * es), es);
    for (int ax = (int)r - 1; ax >= 0; --ax) {
      coord[ax]++;
      oc += sc[ax]; oa += sa[ax]; ob += sb[ax];
      if (coord[ax] < os[ax]) break;
      oc -= sc[ax] * os[ax]; oa -= sa[ax] * os[ax]; ob -= sb[ax] * os[ax];
      coord[ax] = 0;
    }
  }
  return out;
}

static Tensor reduce(const Tensor& x, std::vector<int64_t> axes, bool keepdims,
                     const std::string& kind) {
  size_t r = x.shape.size();
  std::vector<bool> red(r, false);
  if (axes.empty()) {
    red.assign(r, true);
  } else {
    for (auto a : axes) red[(a % (int64_t)r + r) % r] = true;
  }
  std::vector<int64_t> oshape_keep(r);
  int64_t rcount = 1;
  for (size_t i = 0; i < r; ++i) {
    oshape_keep[i] = red[i] ? 1 : x.shape[i];
    if (red[i]) rcount *= x.shape[i];
  }
  Tensor acc(F64, oshape_keep);
  double init = kind == "max" ? -std::numeric_limits<double>::infinity()
              : kind == "min" ? std::numeric_limits<double>::infinity()
              : kind == "prod" ? 1.0 : 0.0;
  for (int64_t i = 0; i < acc.numel(); ++i) acc.ptr<double>()[i] = init;
  auto ost = bcast_strides(oshape_keep, r);
  std::vector<int64_t> coord(r, 0);
  int64_t ooff = 0;
  int64_t total = x.numel();
  double* A = acc.ptr<double>();
  for (int64_t i = 0; i < total; ++i) {
    double v = x.getf(i);
    if (kind == "max") A[ooff] = std::max(A[ooff], v);
    else if (kind == "min") A[ooff] = std::min(A[ooff], v);
    else if (kind == "prod") A[ooff] *= v;
    else A[ooff] += v;
    for (int ax = (int)r - 1; ax >= 0; --ax) {
      coord[ax]++;
      ooff += ost[ax];
      if (coord[ax] < x.shape[ax]) break;
      ooff -= ost[ax] * x.shape[ax];
      coord[ax] = 0;
    }
  }
  std::vector<int64_t> oshape;
  for (size_t i = 0; i < r; ++i)
    if (keepdims) oshape.push_back(oshape_keep[i]);
    else if (!red[i]) oshape.push_back(x.shape[i]);
  Tensor out(x.dt, oshape);
  for (int64_t i = 0; i < out.numel(); ++i) {
    double v = A[i];
    if (kind == "mean") v /= (double)rcount;
    out.setf(i, v);
  }
  return out;
}

static Tensor argminmax(const Tensor& x, int64_t axis, bool keepdims, bool is_max) {
  size_t r = x.shape.size();
  axis = (axis % (int64_t)r + r) % r;
  int64_t outer = 1, inner = 1, n = x.shape[axis];
  for (int64_t i = 0; i < axis; ++i) outer *= x.shape[i];
  for (size_t i = axis + 1; i < r; ++i) inner *= x.shape[i];
  std::vector<int64_t> oshape;
  for (size_t i = 0; i < r; ++i) {
    if ((int64_t)i == axis) { if (keepdims) oshape.push_back(1); }
    else oshape.push_back(x.shape[i]);
  }
  Tensor out(I64, oshape);
  int64_t* O_ = out.ptr<int64_t>();
  for (int64_t o = 0; o < outer; ++o)
    for (int64_t in = 0; in < inner; ++in) {
      int64_t best = 0;
      double bv = x.getf(o * n * inner + in);
      for (int64_t k = 1; k < n; ++k) {
        double v = x.getf((o * n + k) * inner + in);
        if (is_max ? v > bv : v < bv) { bv = v; best = k; }
      }
      O_[o * inner + in] = best;
    }
  return out;
}

// TopK along axis; stable (ties keep ascending index), matches numpy
// argsort(-x, kind="stable").
static std::pair<Tensor, Tensor> topk(const Tensor& x, int64_t k, int64_t axis,
                                      bool largest) {
  size_t r = x.shape.size();
  axis = (axis % (int64_t)r + r) % r;
  int64_t outer = 1, inner = 1, n = x.shape[axis];
  for (int64_t i = 0; i < axis; ++i) outer *= x.shape[i];
  for (size_t i = axis + 1; i < r; ++i) inner *= x.shape[i];
  auto oshape = x.shape;
  oshape[axis] = k;
  Tensor vals(x.dt, oshape), idxs(I64, oshape);
  std::vector<int64_t> order(n);
  for (int64_t o = 0; o < outer; ++o)
    for (int64_t in = 0; in < inner; ++in) {
      std::iota(order.begin(), order.end(), 0);
      auto key = [&](int64_t i) { return x.getf((o * n + i) * inner + in); };
      std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        return largest ? key(a) > key(b) : key(a) < key(b);
      });
      for (int64_t j = 0; j < k; ++j) {
        vals.setf((o * k + j) * inner + in, key(order[j]));
        idxs.ptr<int64_t>()[(o * k + j) * inner + in] = order[j];
      }
    }
  return {vals, idxs};
}

static Tensor gather(const Tensor& x, const Tensor& idx, int64_t axis) {
  size_t r = x.shape.size();
  axis = (axis % (int64_t)r + r) % r;
  int64_t outer = 1, inner = 1, n = x.shape[axis];
  for (int64_t i = 0; i < axis; ++i) outer *= x.shape[i];
  for (size_t i = axis + 1; i < r; ++i) inner *= x.shape[i];
  std::vector<int64_t> oshape(x.shape.begin(), x.shape.begin() + axis);
  oshape.insert(oshape.end(), idx.shape.begin(), idx.shape.end());
  oshape.insert(oshape.end(), x.shape.begin() + axis + 1, x.shape.end());
  Tensor out(x.dt, oshape);
  size_t es = dt_size(x.dt);
  int64_t m = idx.numel();
  const uint8_t* X = x.buf->data();
  uint8_t* O_ = out.buf->data();
  for (int64_t o = 0; o < outer; ++o)
    for (int64_t j = 0; j < m; ++j) {
      int64_t id = idx.geti(j);
      if (id < 0) id += n;
      std::memcpy(O_ + ((o * m + j) * inner) * es,
                  X + ((o * n + id) * inner) * es, inner * es);
    }
  return out;
}

static Tensor gather_elements(const Tensor& x, const Tensor& idx, int64_t axis) {
  size_t r = x.shape.size();
  axis = (axis % (int64_t)r + r) % r;
  Tensor out(x.dt, idx.shape);
  auto xst = row_strides(x.shape);
  std::vector<int64_t> coord(r, 0);
  int64_t total = idx.numel();
  for (int64_t i = 0; i < total; ++i) {
    int64_t id = idx.geti(i);
    if (id < 0) id += x.shape[axis];
    int64_t xoff = 0;
    for (size_t ax = 0; ax < r; ++ax)
      xoff += ((int64_t)ax == axis ? id : coord[ax]) * xst[ax];
    out.setf(i, x.getf(xoff));
    for (int ax = (int)r - 1; ax >= 0; --ax) {
      coord[ax]++;
      if (coord[ax] < idx.shape[ax]) break;
      coord[ax] = 0;
    }
  }
  return out;
}

static Tensor gather_nd(const Tensor& x, const Tensor& idx) {
  int64_t k = idx.shape.back();
  int64_t rows = idx.numel() / k;
  auto xst = row_strides(x.shape);
  std::vector<int64_t> oshape(idx.shape.begin(), idx.shape.end() - 1);
  int64_t inner = 1;
  for (size_t i = k; i < x.shape.size(); ++i) {
    oshape.push_back(x.shape[i]);
    inner *= x.shape[i];
  }
  Tensor out(x.dt, oshape);
  size_t es = dt_size(x.dt);
  for (int64_t rI = 0; rI < rows; ++rI) {
    int64_t off = 0;
    for (int64_t j = 0; j < k; ++j) {
      int64_t id = idx.geti(rI * k + j);
      if (id < 0) id += x.shape[j];
      off += id * xst[j];
    }
    std::memcpy(out.buf->data() + rI * inner * es, x.buf->data() + off * es,
                inner * es);
  }
  return out;
}

// ONNX Slice with the same clamp semantics as nn/onnx_runtime._slice.
static Tensor slice_op(const Tensor& x, const std::vector<int64_t>& starts,
                       const std::vector<int64_t>& ends,
                       const std::vector<int64_t>* axes_in,
                       const std::vector<int64_t>* steps_in) {
  size_t r = x.shape.size();
  size_t k = starts.size();
  std::vector<int64_t> start(r, 0), stop(r), step(r, 1);
  for (size_t i = 0; i < r; ++i) stop[i] = x.shape[i];
  for (size_t i = 0; i < k; ++i) {
    int64_t ax = axes_in ? ((*axes_in)[i] % (int64_t)r + r) % r : (int64_t)i;
    int64_t sp = steps_in ? (*steps_in)[i] : 1;
    int64_t st = starts[i], en = ends[i];
    int64_t lim = x.shape[ax];
    if (sp > 0) {
      st = std::min(std::max(st < 0 ? st + lim : st, (int64_t)0), lim);
      en = std::min(std::max(en < 0 ? en + lim : en, (int64_t)0), lim);
    } else {
      bool open_end = en <= -(lim + 1);
      st = std::min(std::max(st < 0 ? st + lim : st, (int64_t)-1), lim - 1);
      en = open_end ? -1  // sentinel: run to (and including) element 0
                    : std::max(std::min(en < -1 ? en + lim : en, lim), -lim - 1);
      if (open_end) en = -1;  // exclusive bound below zero
    }
    start[ax] = st;
    stop[ax] = en;
    step[ax] = sp;
  }
  std::vector<int64_t> oshape(r);
  for (size_t i = 0; i < r; ++i) {
    int64_t len;
    if (step[i] > 0) len = std::max((int64_t)0, (stop[i] - start[i] + step[i] - 1) / step[i]);
    else len = std::max((int64_t)0, (start[i] - stop[i] - step[i] - 1) / (-step[i]));
    oshape[i] = len;
  }
  Tensor out(x.dt, oshape);
  auto xst = row_strides(x.shape);
  size_t es = dt_size(x.dt);
  std::vector<int64_t> coord(r, 0);
  int64_t total = out.numel();
  for (int64_t i = 0; i < total; ++i) {
    int64_t xoff = 0;
    for (size_t ax = 0; ax < r; ++ax)
      xoff += (start[ax] + coord[ax] * step[ax]) * xst[ax];
    std::memcpy(out.buf->data() + i * es, x.buf->data() + xoff * es, es);
    for (int ax = (int)r - 1; ax >= 0; --ax) {
      coord[ax]++;
      if (coord[ax] < oshape[ax]) break;
      coord[ax] = 0;
    }
  }
  return out;
}

static Tensor concat(const std::vector<Tensor>& ts, int64_t axis) {
  size_t r = ts[0].shape.size();
  axis = (axis % (int64_t)r + r) % r;
  auto oshape = ts[0].shape;
  oshape[axis] = 0;
  for (auto& t : ts) oshape[axis] += t.shape[axis];
  Tensor out(ts[0].dt, oshape);
  int64_t outer = 1, inner = 1;
  for (int64_t i = 0; i < axis; ++i) outer *= oshape[i];
  for (size_t i = axis + 1; i < r; ++i) inner *= oshape[i];
  size_t es = dt_size(out.dt);
  int64_t row_out = oshape[axis] * inner;
  int64_t off = 0;
  for (auto& t : ts) {
    int64_t row_in = t.shape[axis] * inner;
    for (int64_t o = 0; o < outer; ++o)
      std::memcpy(out.buf->data() + (o * row_out + off) * es,
                  t.buf->data() + o * row_in * es, row_in * es);
    off += row_in;
  }
  return out;
}

// General 2-operand einsum via batch/contract classification -> batched
// matmul with double accumulation (covers the exporter's batched-matmul
// equations and the standard matrix cases).
static Tensor einsum2(const std::string& eq, const Tensor& A, const Tensor& B) {
  auto arrow = eq.find("->");
  auto comma = eq.find(',');
  std::string la = eq.substr(0, comma);
  std::string lb = eq.substr(comma + 1, arrow - comma - 1);
  std::string lo = eq.substr(arrow + 2);
  auto strip = [](std::string s) {
    s.erase(std::remove(s.begin(), s.end(), ' '), s.end());
    return s;
  };
  la = strip(la); lb = strip(lb); lo = strip(lo);
  std::map<char, int64_t> dim;
  for (size_t i = 0; i < la.size(); ++i) dim[la[i]] = A.shape[i];
  for (size_t i = 0; i < lb.size(); ++i) dim[lb[i]] = B.shape[i];
  auto in = [](const std::string& s, char c) { return s.find(c) != std::string::npos; };
  std::string batch, contract, fa, fb;
  for (char c : la) {
    if (in(lb, c)) { (in(lo, c) ? batch : contract) += c; }
    else fa += c;  // appears in A only (must be in output for our subset)
  }
  for (char c : lb)
    if (!in(la, c)) fb += c;
  // permute A -> batch + fa + contract, B -> batch + contract + fb
  auto perm_of = [&](const std::string& labels, const std::string& order) {
    std::vector<int64_t> p;
    for (char c : order) p.push_back(labels.find(c));
    return p;
  };
  std::string oa = batch + fa + contract, ob = batch + contract + fb;
  Tensor At = transpose(A, perm_of(la, oa));
  Tensor Bt = transpose(B, perm_of(lb, ob));
  int64_t nb = 1, m = 1, kk = 1, nn = 1;
  for (char c : batch) nb *= dim[c];
  for (char c : fa) m *= dim[c];
  for (char c : contract) kk *= dim[c];
  for (char c : fb) nn *= dim[c];
  Tensor C(F32, {nb, m, nn});
  const float* a = At.ptr<float>();
  const float* b = Bt.ptr<float>();
  float* cc = C.ptr<float>();
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t bi = 0; bi < nb; ++bi)
    for (int64_t mi = 0; mi < m; ++mi) {
      const float* arow = a + (bi * m + mi) * kk;
      for (int64_t ni = 0; ni < nn; ++ni) {
        double acc = 0;
        const float* bcol = b + bi * kk * nn + ni;
        for (int64_t ki = 0; ki < kk; ++ki) acc += (double)arow[ki] * bcol[ki * nn];
        cc[(bi * m + mi) * nn + ni] = (float)acc;
      }
    }
  // reshape to batch+fa+fb then permute to output order
  std::vector<int64_t> cshape;
  std::string cl = batch + fa + fb;
  for (char c : cl) cshape.push_back(dim[c]);
  C.shape = cshape;
  return transpose(C, perm_of(cl, lo));
}

static Tensor pad_op(const Tensor& x, const std::vector<int64_t>& pads, double cval) {
  size_t r = x.shape.size();
  std::vector<int64_t> oshape(r);
  for (size_t i = 0; i < r; ++i) oshape[i] = x.shape[i] + pads[i] + pads[i + r];
  Tensor out(x.dt, oshape);
  for (int64_t i = 0; i < out.numel(); ++i) out.setf(i, cval);
  auto ost = row_strides(oshape);
  size_t es = dt_size(x.dt);
  std::vector<int64_t> coord(r, 0);
  int64_t total = x.numel();
  int64_t inner = x.shape[r - 1];
  // copy row-by-row (last axis contiguous)
  int64_t rows = total / inner;
  for (int64_t rw = 0; rw < rows; ++rw) {
    int64_t ooff = 0;
    for (size_t ax = 0; ax + 1 < r; ++ax) ooff += (coord[ax] + pads[ax]) * ost[ax];
    ooff += pads[r - 1];
    std::memcpy(out.buf->data() + ooff * es, x.buf->data() + rw * inner * es,
                inner * es);
    for (int ax = (int)r - 2; ax >= 0; --ax) {
      coord[ax]++;
      if (coord[ax] < x.shape[ax]) break;
      coord[ax] = 0;
    }
  }
  return out;
}

static Tensor cumsum(const Tensor& x, int64_t axis, bool reverse) {
  size_t r = x.shape.size();
  axis = (axis % (int64_t)r + r) % r;
  int64_t outer = 1, inner = 1, n = x.shape[axis];
  for (int64_t i = 0; i < axis; ++i) outer *= x.shape[i];
  for (size_t i = axis + 1; i < r; ++i) inner *= x.shape[i];
  Tensor out(x.dt, x.shape);
  for (int64_t o = 0; o < outer; ++o)
    for (int64_t in = 0; in < inner; ++in) {
      double acc = 0;
      for (int64_t j = 0; j < n; ++j) {
        int64_t k = reverse ? n - 1 - j : j;
        acc += x.getf((o * n + k) * inner + in);
        out.setf((o * n + k) * inner + in, acc);
      }
    }
  return out;
}

// ------------------------------------------------------------- interpreter

struct Runtime {
  Model model;
  std::vector<std::string> input_names;
  std::vector<std::string> output_names;

  explicit Runtime(const std::vector<uint8_t>& bytes) : model(decode_model(bytes)) {
    for (auto& vi : model.graph.inputs)
      if (!model.graph.initializers.count(vi.name)) input_names.push_back(vi.name);
    for (auto& vi : model.graph.outputs) output_names.push_back(vi.name);
  }

  std::vector<Tensor> run(const std::vector<Tensor>& args) {
    std::unordered_map<std::string, Tensor> env(model.graph.initializers.begin(),
                                                model.graph.initializers.end());
    for (size_t i = 0; i < args.size() && i < input_names.size(); ++i)
      env[input_names[i]] = args[i];
    for (auto& node : model.graph.nodes) {
      std::vector<const Tensor*> ins;
      for (auto& nm : node.inputs) {
        if (nm.empty()) { ins.push_back(nullptr); continue; }
        auto it = env.find(nm);
        if (it == env.end()) throw std::runtime_error("missing input " + nm + " for " + node.op);
        ins.push_back(&it->second);
      }
      auto outs = exec(node, ins);
      for (size_t i = 0; i < node.outputs.size() && i < outs.size(); ++i)
        env[node.outputs[i]] = std::move(outs[i]);
    }
    std::vector<Tensor> res;
    for (auto& nm : output_names) res.push_back(env.at(nm));
    return res;
  }

  std::vector<Tensor> exec(const Node& nd, std::vector<const Tensor*>& in) {
    const std::string& op = nd.op;
    auto ivals = [&](const Tensor& t) {
      std::vector<int64_t> v(t.numel());
      for (int64_t i = 0; i < t.numel(); ++i) v[i] = t.geti(i);
      return v;
    };
    if (op == "Conv")
      return {conv(*in[0], *in[1], in.size() > 2 ? in[2] : nullptr,
                   nd.attr_ints("pads", {0, 0, 0, 0}),
                   nd.attr_ints("strides", {1, 1}),
                   nd.attr_ints("dilations", {1, 1}), nd.attr_i("group", 1))};
    if (op == "MaxPool")
      return {maxpool(*in[0], nd.attr_ints("kernel_shape", {1, 1}),
                      nd.attr_ints("strides", {1, 1}),
                      nd.attr_ints("pads", {0, 0, 0, 0}))};
    if (op == "Transpose") return {transpose(*in[0], nd.attr_ints("perm", {}))};
    if (op == "Reshape") {
      auto shp = ivals(*in[1]);
      int64_t known = 1, neg = -1;
      for (size_t i = 0; i < shp.size(); ++i) {
        if (shp[i] == 0) shp[i] = in[0]->shape[i];  // ONNX: 0 copies input dim
        if (shp[i] == -1) neg = (int64_t)i;
        else known *= shp[i];
      }
      if (neg >= 0) shp[neg] = in[0]->numel() / known;
      Tensor out = *in[0];
      out.shape = shp;
      return {out};
    }
    if (op == "Expand") {
      auto target = ivals(*in[1]);
      auto os = broadcast_shape(in[0]->shape, target);
      size_t r = os.size();
      auto sa = bcast_strides(in[0]->shape, r);
      Tensor out(in[0]->dt, os);
      size_t es = dt_size(out.dt);
      auto zero = bcast_strides(os, r);  // unused b-side
      bcast_iter(os, sa, zero, [&](int64_t oi, int64_t ia, int64_t) {
        std::memcpy(out.buf->data() + oi * es, in[0]->buf->data() + ia * es, es);
      });
      return {out};
    }
    if (op == "Concat") {
      std::vector<Tensor> ts;
      for (auto* p : in) ts.push_back(*p);
      return {concat(ts, nd.attr_i("axis", 0))};
    }
    if (op == "Split") {
      std::vector<int64_t> sizes = in.size() > 1 ? ivals(*in[1]) : nd.attr_ints("split", {});
      int64_t axis = nd.attr_i("axis", 0);
      size_t r = in[0]->shape.size();
      axis = (axis % (int64_t)r + r) % r;
      std::vector<Tensor> outs;
      int64_t start = 0;
      for (auto sz : sizes) {
        std::vector<int64_t> st{start}, en{start + sz}, ax{axis};
        outs.push_back(slice_op(*in[0], st, en, &ax, nullptr));
        start += sz;
      }
      return outs;
    }
    if (op == "Slice") {
      auto starts = ivals(*in[1]), ends = ivals(*in[2]);
      std::vector<int64_t> axes, steps;
      if (in.size() > 3 && in[3]) axes = ivals(*in[3]);
      if (in.size() > 4 && in[4]) steps = ivals(*in[4]);
      return {slice_op(*in[0], starts, ends, axes.empty() ? nullptr : &axes,
                       steps.empty() ? nullptr : &steps)};
    }
    if (op == "Cast") {
      int to = (int)nd.attr_i("to", F32);
      Tensor out(to, in[0]->shape);
      bool from_f = in[0]->is_float();
      for (int64_t i = 0; i < out.numel(); ++i)
        out.setf(i, from_f && (to == I32 || to == I64)
                        ? (double)(int64_t)in[0]->getf(i)  // trunc toward 0
                        : in[0]->getf(i));
      return {out};
    }
    if (op == "Identity") return {*in[0]};
    if (op == "Sigmoid") {
      Tensor out(in[0]->dt, in[0]->shape);
      for (int64_t i = 0; i < out.numel(); ++i) {
        double x = in[0]->getf(i);
        out.setf(i, 1.0 / (1.0 + std::exp(-x)));
      }
      return {out};
    }
    if (op == "Softmax") {
      int64_t axis = nd.attr_i("axis", -1);
      size_t r = in[0]->shape.size();
      axis = (axis % (int64_t)r + r) % r;
      int64_t outer = 1, inner = 1, n = in[0]->shape[axis];
      for (int64_t i = 0; i < axis; ++i) outer *= in[0]->shape[i];
      for (size_t i = axis + 1; i < r; ++i) inner *= in[0]->shape[i];
      Tensor out(in[0]->dt, in[0]->shape);
      for (int64_t o = 0; o < outer; ++o)
        for (int64_t ii = 0; ii < inner; ++ii) {
          double mx = -std::numeric_limits<double>::infinity();
          for (int64_t j = 0; j < n; ++j)
            mx = std::max(mx, in[0]->getf((o * n + j) * inner + ii));
          double s = 0;
          for (int64_t j = 0; j < n; ++j)
            s += std::exp(in[0]->getf((o * n + j) * inner + ii) - mx);
          for (int64_t j = 0; j < n; ++j)
            out.setf((o * n + j) * inner + ii,
                     std::exp(in[0]->getf((o * n + j) * inner + ii) - mx) / s);
        }
      return {out};
    }
    // unary
    static const std::map<std::string, double (*)(double)> UNARY = {
        {"Exp", [](double x) { return std::exp(x); }},
        {"Log", [](double x) { return std::log(x); }},
        {"Sqrt", [](double x) { return std::sqrt(x); }},
        {"Tanh", [](double x) { return std::tanh(x); }},
        {"Neg", [](double x) { return -x; }},
        {"Abs", [](double x) { return std::abs(x); }},
        {"Sign", [](double x) { return (double)((x > 0) - (x < 0)); }},
        {"Floor", [](double x) { return std::floor(x); }},
        {"Ceil", [](double x) { return std::ceil(x); }},
        {"Round", [](double x) { return std::nearbyint(x); }},
        {"Sin", [](double x) { return std::sin(x); }},
        {"Cos", [](double x) { return std::cos(x); }},
        {"Erf", [](double x) { return std::erf(x); }},
        {"Reciprocal", [](double x) { return 1.0 / x; }},
    };
    {
      auto it = UNARY.find(op);
      if (it != UNARY.end()) {
        Tensor out(in[0]->dt, in[0]->shape);
        for (int64_t i = 0; i < out.numel(); ++i) out.setf(i, it->second(in[0]->getf(i)));
        return {out};
      }
    }
    if (op == "Not" || op == "IsNaN" || op == "IsInf") {
      Tensor out(BOOL, in[0]->shape);
      for (int64_t i = 0; i < out.numel(); ++i) {
        double x = in[0]->getf(i);
        bool v = op == "Not" ? (in[0]->geti(i) == 0)
               : op == "IsNaN" ? std::isnan(x) : std::isinf(x);
        out.ptr<uint8_t>()[i] = v;
      }
      return {out};
    }
    static const std::map<std::string, BinOp> BIN = {
        {"Add", BinOp::Add}, {"Sub", BinOp::Sub}, {"Mul", BinOp::Mul},
        {"Div", BinOp::Div}, {"Max", BinOp::Max}, {"Min", BinOp::Min},
        {"Pow", BinOp::Pow}, {"And", BinOp::And}, {"Or", BinOp::Or},
        {"Xor", BinOp::Xor}, {"Equal", BinOp::Eq}, {"Greater", BinOp::Gt},
        {"Less", BinOp::Lt}, {"GreaterOrEqual", BinOp::Ge},
        {"LessOrEqual", BinOp::Le},
    };
    {
      auto it = BIN.find(op);
      if (it != BIN.end()) return {binary(*in[0], *in[1], it->second)};
    }
    if (op == "Mod")
      return {binary(*in[0], *in[1], nd.attr_i("fmod", 0) ? BinOp::FMod : BinOp::Mod)};
    if (op == "Where") return {where_op(*in[0], *in[1], *in[2])};
    if (op == "Clip") {
      Tensor out(in[0]->dt, in[0]->shape);
      double lo = in.size() > 1 && in[1] ? in[1]->getf(0) : -std::numeric_limits<double>::infinity();
      double hi = in.size() > 2 && in[2] ? in[2]->getf(0) : std::numeric_limits<double>::infinity();
      for (int64_t i = 0; i < out.numel(); ++i)
        out.setf(i, std::min(std::max(in[0]->getf(i), lo), hi));
      return {out};
    }
    if (op == "ReduceSum") {
      std::vector<int64_t> axes = in.size() > 1 && in[1] ? ivals(*in[1]) : std::vector<int64_t>{};
      return {reduce(*in[0], axes, nd.attr_i("keepdims", 1), "sum")};
    }
    if (op == "ReduceMax" || op == "ReduceMin" || op == "ReduceProd" || op == "ReduceMean") {
      std::string kind = op == "ReduceMax" ? "max" : op == "ReduceMin" ? "min"
                       : op == "ReduceProd" ? "prod" : "mean";
      return {reduce(*in[0], nd.attr_ints("axes", {}), nd.attr_i("keepdims", 1), kind)};
    }
    if (op == "ArgMax" || op == "ArgMin")
      return {argminmax(*in[0], nd.attr_i("axis", 0), nd.attr_i("keepdims", 1),
                        op == "ArgMax")};
    if (op == "TopK") {
      auto [v, i] = topk(*in[0], in[1]->geti(0), nd.attr_i("axis", -1),
                         nd.attr_i("largest", 1));
      return {v, i};
    }
    if (op == "Gather") return {gather(*in[0], *in[1], nd.attr_i("axis", 0))};
    if (op == "GatherElements")
      return {gather_elements(*in[0], *in[1], nd.attr_i("axis", 0))};
    if (op == "GatherND") return {gather_nd(*in[0], *in[1])};
    if (op == "Einsum") return {einsum2(nd.attrs.at("equation").s, *in[0], *in[1])};
    if (op == "MatMul") {
      // build an einsum equation for batched matmul with equal batch ranks
      const Tensor &A = *in[0], &B = *in[1];
      std::string la, lb;
      size_t ra = A.shape.size(), rb = B.shape.size();
      size_t nb = std::max(ra, rb) - 2;
      std::string batch;
      for (size_t i = 0; i < nb; ++i) batch += (char)('a' + i);
      la = batch.substr(nb - (ra - 2)) + "xy";
      lb = batch.substr(nb - (rb - 2)) + "yz";
      return {einsum2(la + "," + lb + "->" + batch + "xz", A, B)};
    }
    if (op == "Pad") {
      auto pads = ivals(*in[1]);
      double cval = in.size() > 2 && in[2] ? in[2]->getf(0) : 0.0;
      return {pad_op(*in[0], pads, cval)};
    }
    if (op == "CumSum")
      return {cumsum(*in[0], in[1]->geti(0), nd.attr_i("reverse", 0))};
    throw std::runtime_error("ONNX op '" + op + "' not implemented in C++ client");
  }
};

// ------------------------------------------------- image mode (PPM letterbox)

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // HWC
};

static Image load_ppm(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::string magic;
  f >> magic;
  if (magic != "P6") throw std::runtime_error("only binary P6 .ppm supported");
  auto next_int = [&]() {
    int v;
    while (true) {
      f >> std::ws;
      if (f.peek() == '#') { std::string line; std::getline(f, line); continue; }
      f >> v;
      return v;
    }
  };
  Image im;
  im.w = next_int();
  im.h = next_int();
  int maxv = next_int();
  if (maxv != 255) throw std::runtime_error("ppm maxval must be 255");
  f.get();  // single whitespace after header
  im.rgb.resize((size_t)im.w * im.h * 3);
  f.read((char*)im.rgb.data(), im.rgb.size());
  return im;
}

// Letterbox to (H,W): aspect-preserving bilinear resize, center pad 114
// (matches the repo's predictor preprocess / reference LetterBox,
// reference: ultralytics/data/augment.py:684). Output NCHW float [0,1].
static Tensor letterbox(const Image& im, int64_t H, int64_t W, float* scale,
                        int* pad_x, int* pad_y) {
  float r = std::min((float)H / im.h, (float)W / im.w);
  int nw = (int)std::round(im.w * r), nh = (int)std::round(im.h * r);
  int px = (int)((W - nw) / 2), py = (int)((H - nh) / 2);
  *scale = r;
  *pad_x = px;
  *pad_y = py;
  Tensor out(F32, {1, 3, H, W});
  float* O_ = out.ptr<float>();
  for (int64_t i = 0; i < out.numel(); ++i) O_[i] = 114.0f / 255.0f;
  for (int y = 0; y < nh; ++y) {
    float sy = (y + 0.5f) / r - 0.5f;
    int y0 = (int)std::floor(sy);
    float fy = sy - y0;
    int y1 = std::min(std::max(y0 + 1, 0), im.h - 1);
    y0 = std::min(std::max(y0, 0), im.h - 1);
    for (int x = 0; x < nw; ++x) {
      float sx = (x + 0.5f) / r - 0.5f;
      int x0 = (int)std::floor(sx);
      float fx = sx - x0;
      int x1 = std::min(std::max(x0 + 1, 0), im.w - 1);
      x0 = std::min(std::max(x0, 0), im.w - 1);
      for (int ch = 0; ch < 3; ++ch) {
        float v00 = im.rgb[(y0 * im.w + x0) * 3 + ch];
        float v01 = im.rgb[(y0 * im.w + x1) * 3 + ch];
        float v10 = im.rgb[(y1 * im.w + x0) * 3 + ch];
        float v11 = im.rgb[(y1 * im.w + x1) * 3 + ch];
        float v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                  v10 * fy * (1 - fx) + v11 * fy * fx;
        O_[(ch * H + (y + py)) * W + (x + px)] = v / 255.0f;
      }
    }
  }
  return out;
}

// ----------------------------------------------------------------- main

static std::vector<uint8_t> read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  return std::vector<uint8_t>((std::istreambuf_iterator<char>(f)),
                              std::istreambuf_iterator<char>());
}

static bool ends_with(const std::string& s, const std::string& suf) {
  return s.size() >= suf.size() && s.compare(s.size() - suf.size(), suf.size(), suf) == 0;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::cerr << "usage: " << argv[0]
              << " model.onnx (input.npy [input2.npy ...] | image.ppm)"
                 " [--out prefix] [--conf C] [--repeat N]\n";
    return 2;
  }
  try {
    std::string model_path = argv[1];
    std::vector<std::string> inputs;
    std::string out_prefix = "out_";
    double conf = 0.25;
    int repeat = 1;
    for (int i = 2; i < argc; ++i) {
      std::string a = argv[i];
      if (a == "--out") out_prefix = argv[++i];
      else if (a == "--conf") conf = std::stod(argv[++i]);
      else if (a == "--repeat") repeat = std::stoi(argv[++i]);
      else inputs.push_back(a);
    }
    Runtime rt(read_file(model_path));
    std::cerr << "model: " << rt.model.graph.name << " ("
              << rt.model.graph.nodes.size() << " nodes, opset "
              << rt.model.opset << ")\n";

    bool image_mode = inputs.size() == 1 && ends_with(inputs[0], ".ppm");
    std::vector<Tensor> args;
    float scale = 1.0f;
    int pad_x = 0, pad_y = 0;
    Image im;
    if (image_mode) {
      im = load_ppm(inputs[0]);
      // graph input is NCHW `images` (nn/onnx_export.py nchw_input)
      auto& vi = rt.model.graph.inputs[0];
      int64_t H = vi.shape[2], W = vi.shape[3];
      args.push_back(letterbox(im, H, W, &scale, &pad_x, &pad_y));
    } else {
      for (auto& p : inputs) args.push_back(load_npy(p));
    }

    std::vector<Tensor> outs;
    auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < repeat; ++i) outs = rt.run(args);
    auto t1 = std::chrono::steady_clock::now();
    double ms = std::chrono::duration<double, std::milli>(t1 - t0).count() / repeat;
    std::cerr << "inference: " << ms << " ms/run\n";

    if (image_mode && outs.size() == 3) {
      // boxes (1,K,4) xyxy in letterbox pixels, scores (1,K), labels (1,K)
      const Tensor &boxes = outs[0], &scores = outs[1], &labels = outs[2];
      int64_t K = boxes.shape[1];
      int printed = 0;
      for (int64_t k = 0; k < K; ++k) {
        double s = scores.getf(k);
        if (s < conf) continue;
        double x1 = (boxes.getf(k * 4 + 0) - pad_x) / scale;
        double y1 = (boxes.getf(k * 4 + 1) - pad_y) / scale;
        double x2 = (boxes.getf(k * 4 + 2) - pad_x) / scale;
        double y2 = (boxes.getf(k * 4 + 3) - pad_y) / scale;
        x1 = std::min(std::max(x1, 0.0), (double)im.w);
        y1 = std::min(std::max(y1, 0.0), (double)im.h);
        x2 = std::min(std::max(x2, 0.0), (double)im.w);
        y2 = std::min(std::max(y2, 0.0), (double)im.h);
        std::cout << "det class=" << labels.geti(k) << " conf=" << s
                  << " box=[" << x1 << ", " << y1 << ", " << x2 << ", " << y2
                  << "]\n";
        printed++;
      }
      std::cerr << printed << " detections >= conf " << conf << "\n";
    } else {
      for (size_t i = 0; i < outs.size(); ++i) {
        std::string path = out_prefix + rt.output_names[i] + ".npy";
        save_npy(path, outs[i]);
        std::cout << "wrote " << path << " shape=(";
        for (size_t j = 0; j < outs[i].shape.size(); ++j)
          std::cout << outs[i].shape[j] << (j + 1 < outs[i].shape.size() ? "," : "");
        std::cout << ")\n";
      }
    }
  } catch (const std::exception& e) {
    std::cerr << "error: " << e.what() << "\n";
    return 1;
  }
  return 0;
}
