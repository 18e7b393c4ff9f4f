// Native IO runtime for lightdock_tpu.
//
// The reference engine's runtime (PDB parsing, positions parsing, formatted
// snapshot output) is native code; this library provides the same for the
// TPU framework, exposed through a C ABI consumed via ctypes
// (lightdock_tpu/utils/native.py).  The Python implementations remain as
// behavioural fallbacks; outputs must match them byte-for-byte.
//
// PDB field semantics follow lightdock_tpu/utils/pdb.py: ATOM/HETATM
// records, columns 13-16 atom name, 18-20 residue name, 22 chain id,
// 23-26 residue serial, 27 insertion code, 31-54 coordinates; res_id is
// "{chain}.{resname}.{serial}{icode?}".
//
// gso_N.out formatting follows lightdock_tpu/utils/output.py (reference
// format src/swarm.rs:128-167): "%.7f" pose components, literal
// "    0    0   ", "%.8f" luciferin, "%d" neighbor count, "%.3f" vision,
// "%.8f" scoring.

#include <cctype>
#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct PdbData {
  std::vector<double> coords;  // (n, 3) row-major
  // Columns joined with \x1f separators (ASCII unit separator).
  std::string atom_names;
  std::string res_names;
  std::string res_ids;
  std::string chain_ids;
  int64_t natoms = 0;
};

std::string strip(const std::string& s) {
  size_t a = 0, b = s.size();
  while (a < b && std::isspace(static_cast<unsigned char>(s[a]))) ++a;
  while (b > a && std::isspace(static_cast<unsigned char>(s[b - 1]))) --b;
  return s.substr(a, b - a);
}

void append_col(std::string* col, const std::string& v, bool first) {
  if (!first) col->push_back('\x1f');
  col->append(v);
}

}  // namespace

extern "C" {

// Parse a PDB file; returns an opaque handle or nullptr on error.
void* ld_parse_pdb(const char* path) {
  std::ifstream in(path);
  if (!in) return nullptr;
  auto* data = new PdbData();
  std::string line;
  while (std::getline(in, line)) {
    if (line.size() < 6) continue;
    const bool atom = line.compare(0, 6, "ATOM  ") == 0;
    const bool het = line.compare(0, 6, "HETATM") == 0;
    if (!atom && !het) continue;
    // Pad short lines so fixed-column slicing is safe.
    if (line.size() < 54) line.resize(54, ' ');
    const std::string atom_name = strip(line.substr(12, 4));
    const std::string res_name = strip(line.substr(17, 3));
    const std::string chain_id = strip(line.substr(21, 1));
    const std::string res_serial = strip(line.substr(22, 4));
    const std::string icode = strip(line.substr(26, 1));
    char* end = nullptr;
    const std::string xs = line.substr(30, 8), ys = line.substr(38, 8),
                      zs = line.substr(46, 8);
    const double x = std::strtod(xs.c_str(), &end);
    const double y = std::strtod(ys.c_str(), &end);
    const double z = std::strtod(zs.c_str(), &end);
    const bool first = data->natoms == 0;
    append_col(&data->atom_names, atom_name, first);
    append_col(&data->res_names, res_name, first);
    append_col(&data->res_ids,
               chain_id + "." + res_name + "." + res_serial + icode, first);
    append_col(&data->chain_ids, chain_id, first);
    data->coords.push_back(x);
    data->coords.push_back(y);
    data->coords.push_back(z);
    ++data->natoms;
  }
  return data;
}

int64_t ld_pdb_natoms(void* handle) {
  return static_cast<PdbData*>(handle)->natoms;
}

double* ld_pdb_coords(void* handle) {
  return static_cast<PdbData*>(handle)->coords.data();
}

// which: 0=atom_names 1=res_names 2=res_ids 3=chain_ids
const char* ld_pdb_strings(void* handle, int which) {
  auto* d = static_cast<PdbData*>(handle);
  switch (which) {
    case 0: return d->atom_names.c_str();
    case 1: return d->res_names.c_str();
    case 2: return d->res_ids.c_str();
    case 3: return d->chain_ids.c_str();
    default: return "";
  }
}

void ld_pdb_free(void* handle) { delete static_cast<PdbData*>(handle); }

// Write a gso_N.out snapshot.  Returns 0 on success.
int ld_write_gso(const char* path, const double* poses, int64_t g,
                 int64_t pose_dim, const double* luciferin,
                 const int64_t* num_neighbors, const double* vision,
                 const double* scoring) {
  FILE* f = std::fopen(path, "w");
  if (!f) return 1;
  std::fputs(
      "#Coordinates  RecID  LigID  Luciferin  Neighbor's number  Vision "
      "Range  Scoring\n",
      f);
  for (int64_t i = 0; i < g; ++i) {
    std::fputc('(', f);
    for (int64_t j = 0; j < pose_dim; ++j) {
      if (j) std::fputs(", ", f);
      std::fprintf(f, "%.7f", poses[i * pose_dim + j]);
    }
    std::fprintf(f, ")    0    0   %.8f  %" PRId64 " %.3f %.8f\n",
                 luciferin[i], num_neighbors[i], vision[i], scoring[i]);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
