// Fast OBJ tokenizer — the native core of the OBJ loader.
//
// TPU-native replacement for the role of the vendored tinyobjloader
// (reference: external/tinyobjloader/tiny_obj_loader.h, used at
// src/core/file.cppm:52,121): C++ parses the heavy v/vt/vn/f records and
// returns flat arrays; Python (realtimeraytracer_tpu/scene/obj_loader.py)
// keeps the semantic layer (shape splitting, MTL resolution, dedup) and
// falls back to its pure-Python parser when this library isn't built.
//
// Exposed via a C ABI for ctypes. Build: see native/Makefile.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> positions;   // xyz triples
  std::vector<float> texcoords;   // uv pairs
  std::vector<float> normals;     // xyz triples
  // Face corners, triangulated (fan): v/vt/vn indices, -1 when absent.
  std::vector<int64_t> corners;   // 3 ints per corner, 9 per triangle
  // Per-triangle shape id; shape boundaries split on o/g/usemtl.
  std::vector<int32_t> tri_shape;
  std::vector<std::string> shape_names;
  std::vector<std::string> shape_materials;
  std::vector<std::string> mtllibs;
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* next_token(const char* p, const char* end, const char** tok_end) {
  p = skip_ws(p, end);
  const char* q = p;
  while (q < end && *q != ' ' && *q != '\t' && *q != '\r' && *q != '\n') ++q;
  *tok_end = q;
  return p;
}

// Parse one face corner "v", "v/vt", "v//vn", "v/vt/vn" (1-based, negative
// = relative), matching obj_loader.py::_parse_index.
inline void parse_corner(const char* s, const char* e, int64_t nv, int64_t nt,
                         int64_t nn, int64_t out[3]) {
  int64_t vals[3] = {0, 0, 0};
  bool present[3] = {false, false, false};
  int field = 0;
  bool neg = false;
  int64_t acc = 0;
  bool any = false;
  for (const char* p = s; p <= e; ++p) {
    if (p == e || *p == '/') {
      if (any) {
        vals[field] = neg ? -acc : acc;
        present[field] = true;
      }
      ++field;
      neg = false;
      acc = 0;
      any = false;
      if (field > 2) break;
    } else if (*p == '-') {
      neg = true;
    } else if (*p >= '0' && *p <= '9') {
      acc = acc * 10 + (*p - '0');
      any = true;
    }
  }
  const int64_t ns[3] = {nv, nt, nn};
  for (int i = 0; i < 3; ++i) {
    if (!present[i]) {
      out[i] = -1;
    } else if (vals[i] > 0) {
      out[i] = vals[i] - 1;
    } else {
      out[i] = ns[i] + vals[i];
    }
  }
}

ObjData* parse(const char* text, size_t len) {
  auto* d = new ObjData();
  d->shape_names.emplace_back("");
  d->shape_materials.emplace_back("");
  int32_t cur_shape = 0;
  bool cur_shape_used = false;

  const char* p = text;
  const char* end = text + len;
  std::vector<int64_t> face;  // corner indices scratch, 3 per corner

  auto new_shape = [&](const std::string& name, const std::string& mat) {
    if (!cur_shape_used &&
        d->shape_materials[cur_shape].empty() && d->shape_names[cur_shape].empty()) {
      d->shape_names[cur_shape] = name;
      d->shape_materials[cur_shape] = mat;
      return;
    }
    d->shape_names.push_back(name);
    d->shape_materials.push_back(mat);
    cur_shape = static_cast<int32_t>(d->shape_names.size()) - 1;
    cur_shape_used = false;
  };

  while (p < end) {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    const char* q = skip_ws(p, line_end);
    if (q < line_end && *q != '#') {
      const char* te;
      const char* t = next_token(q, line_end, &te);
      size_t tl = te - t;
      const char* rest = te;
      if (tl == 1 && t[0] == 'v') {
        for (int i = 0; i < 3; ++i) {
          const char* ve;
          const char* vs = next_token(rest, line_end, &ve);
          d->positions.push_back(strtof(vs, nullptr));
          rest = ve;
        }
      } else if (tl == 2 && t[0] == 'v' && t[1] == 't') {
        for (int i = 0; i < 2; ++i) {
          const char* ve;
          const char* vs = next_token(rest, line_end, &ve);
          d->texcoords.push_back(vs < ve ? strtof(vs, nullptr) : 0.0f);
          rest = ve;
        }
      } else if (tl == 2 && t[0] == 'v' && t[1] == 'n') {
        for (int i = 0; i < 3; ++i) {
          const char* ve;
          const char* vs = next_token(rest, line_end, &ve);
          d->normals.push_back(strtof(vs, nullptr));
          rest = ve;
        }
      } else if (tl == 1 && t[0] == 'f') {
        face.clear();
        int64_t nv = d->positions.size() / 3;
        int64_t ntc = d->texcoords.size() / 2;
        int64_t nn = d->normals.size() / 3;
        while (true) {
          const char* ce;
          const char* cs = next_token(rest, line_end, &ce);
          if (cs >= ce) break;
          int64_t c[3];
          parse_corner(cs, ce, nv, ntc, nn, c);
          face.insert(face.end(), c, c + 3);
          rest = ce;
        }
        size_t ncorn = face.size() / 3;
        for (size_t k = 1; k + 1 < ncorn; ++k) {  // fan triangulation
          const int64_t* c0 = &face[0];
          const int64_t* c1 = &face[k * 3];
          const int64_t* c2 = &face[(k + 1) * 3];
          d->corners.insert(d->corners.end(), c0, c0 + 3);
          d->corners.insert(d->corners.end(), c1, c1 + 3);
          d->corners.insert(d->corners.end(), c2, c2 + 3);
          d->tri_shape.push_back(cur_shape);
          cur_shape_used = true;
        }
      } else if ((tl == 1 && (t[0] == 'o' || t[0] == 'g'))) {
        const char* ne;
        const char* ns = next_token(rest, line_end, &ne);
        new_shape(std::string(ns, ne - ns), d->shape_materials[cur_shape]);
      } else if (tl == 6 && strncmp(t, "usemtl", 6) == 0) {
        const char* ne;
        const char* ns = next_token(rest, line_end, &ne);
        new_shape(d->shape_names[cur_shape], std::string(ns, ne - ns));
      } else if (tl == 6 && strncmp(t, "mtllib", 6) == 0) {
        const char* ne;
        const char* ns = next_token(rest, line_end, &ne);
        d->mtllibs.emplace_back(ns, ne - ns);
      }
    }
    p = line_end + 1;
  }
  return d;
}

}  // namespace

extern "C" {

void* obj_parse_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(n), '\0');
  size_t rd = fread(buf.data(), 1, n, f);
  fclose(f);
  return parse(buf.data(), rd);
}

void obj_free(void* h) { delete static_cast<ObjData*>(h); }

int64_t obj_num_positions(void* h) { return static_cast<ObjData*>(h)->positions.size() / 3; }
int64_t obj_num_texcoords(void* h) { return static_cast<ObjData*>(h)->texcoords.size() / 2; }
int64_t obj_num_normals(void* h) { return static_cast<ObjData*>(h)->normals.size() / 3; }
int64_t obj_num_tris(void* h) { return static_cast<ObjData*>(h)->tri_shape.size(); }
int64_t obj_num_shapes(void* h) { return static_cast<ObjData*>(h)->shape_names.size(); }
int64_t obj_num_mtllibs(void* h) { return static_cast<ObjData*>(h)->mtllibs.size(); }

const float* obj_positions(void* h) { return static_cast<ObjData*>(h)->positions.data(); }
const float* obj_texcoords(void* h) { return static_cast<ObjData*>(h)->texcoords.data(); }
const float* obj_normals(void* h) { return static_cast<ObjData*>(h)->normals.data(); }
const int64_t* obj_corners(void* h) { return static_cast<ObjData*>(h)->corners.data(); }
const int32_t* obj_tri_shapes(void* h) { return static_cast<ObjData*>(h)->tri_shape.data(); }

const char* obj_shape_name(void* h, int64_t i) {
  return static_cast<ObjData*>(h)->shape_names[i].c_str();
}
const char* obj_shape_material(void* h, int64_t i) {
  return static_cast<ObjData*>(h)->shape_materials[i].c_str();
}
const char* obj_mtllib(void* h, int64_t i) {
  return static_cast<ObjData*>(h)->mtllibs[i].c_str();
}

}  // extern "C"
