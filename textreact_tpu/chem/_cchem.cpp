// Native chemistry kernel: SMILES parsing + Morgan/ECFP fingerprints.
//
// The host-side fast path for corpus fingerprinting (role of RDKit's C++ in
// the reference retriever, retrieve/retrieve_faiss.py:18-50). Semantics are
// bit-identical to the python implementation in chem/mol.py +
// chem/fingerprints.py: same implicit-H rules, same ring perception, same
// 32-bit hash mixing — tests assert exact equality of fingerprints.
//
// Build: g++ -O2 -shared -fPIC -o _cchem.so _cchem.cpp   (chem/native.py
// does this automatically on first use).

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

constexpr uint32_t MASK32 = 0xFFFFFFFFu;

uint32_t mix(uint32_t h, uint32_t v) {
  h ^= v;
  h = (h * 0x9E3779B1u) & MASK32;
  h ^= h >> 16;
  return h;
}

uint32_t hash_ints(const std::vector<uint32_t>& vals) {
  uint32_t h = 0x811C9DC5u;
  for (uint32_t v : vals) h = mix(h, v);
  return h;
}

// --- periodic table subset (matches chem/mol.py ATOMIC_NUM) ---
int atomic_num(const std::string& sym) {
  static const std::map<std::string, int> table = {
      {"H", 1},  {"He", 2}, {"Li", 3}, {"Be", 4}, {"B", 5},  {"C", 6},
      {"N", 7},  {"O", 8},  {"F", 9},  {"Ne", 10}, {"Na", 11}, {"Mg", 12},
      {"Al", 13}, {"Si", 14}, {"P", 15}, {"S", 16}, {"Cl", 17}, {"Ar", 18},
      {"K", 19}, {"Ca", 20}, {"Sc", 21}, {"Ti", 22}, {"V", 23}, {"Cr", 24},
      {"Mn", 25}, {"Fe", 26}, {"Co", 27}, {"Ni", 28}, {"Cu", 29}, {"Zn", 30},
      {"Ga", 31}, {"Ge", 32}, {"As", 33}, {"Se", 34}, {"Br", 35}, {"Kr", 36},
      {"Rb", 37}, {"Sr", 38}, {"Y", 39}, {"Zr", 40}, {"Nb", 41}, {"Mo", 42},
      {"Tc", 43}, {"Ru", 44}, {"Rh", 45}, {"Pd", 46}, {"Ag", 47}, {"Cd", 48},
      {"In", 49}, {"Sn", 50}, {"Sb", 51}, {"Te", 52}, {"I", 53}, {"Xe", 54},
      {"Cs", 55}, {"Ba", 56}, {"La", 57}, {"Ce", 58}, {"Pr", 59}, {"Nd", 60},
      {"Sm", 62}, {"Eu", 63}, {"Gd", 64}, {"Tb", 65}, {"Dy", 66}, {"Ho", 67},
      {"Er", 68}, {"Tm", 69}, {"Yb", 70}, {"Lu", 71}, {"Hf", 72}, {"Ta", 73},
      {"W", 74}, {"Re", 75}, {"Os", 76}, {"Ir", 77}, {"Pt", 78}, {"Au", 79},
      {"Hg", 80}, {"Tl", 81}, {"Pb", 82}, {"Bi", 83}, {"Po", 84}, {"At", 85},
      {"Rn", 86}, {"Fr", 87}, {"Ra", 88}, {"Ac", 89}, {"Th", 90}, {"Pa", 91},
      {"U", 92}};
  auto it = table.find(sym);
  return it == table.end() ? 0 : it->second;
}

enum BondKind { SINGLE = 1, DOUBLE = 2, TRIPLE = 3, QUAD = 4, AROMATIC = 5 };

struct Atom {
  std::string symbol;
  bool aromatic = false;
  int charge = 0;
  int isotope = 0;
  int explicit_h = -1;  // -1 -> compute implicit
  int implicit_h = 0;
  int total_h() const { return explicit_h >= 0 ? explicit_h : implicit_h; }
};

struct Bond {
  int a1, a2;
  int order = SINGLE;
  bool aromatic = false;
};

struct Mol {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
  std::vector<std::vector<int>> adj;  // atom -> bond indices

  int add_atom(Atom a) {
    atoms.push_back(std::move(a));
    adj.emplace_back();
    return (int)atoms.size() - 1;
  }
  void add_bond(int a1, int a2, int order, bool aromatic) {
    bonds.push_back({a1, a2, order, aromatic});
    adj[a1].push_back((int)bonds.size() - 1);
    adj[a2].push_back((int)bonds.size() - 1);
  }
  int other(int b, int a) const { return bonds[b].a1 == a ? bonds[b].a2 : bonds[b].a1; }
};

bool is_organic_subset(const std::string& s) {
  return s == "B" || s == "C" || s == "N" || s == "O" || s == "P" ||
         s == "S" || s == "F" || s == "Cl" || s == "Br" || s == "I";
}

const std::vector<int>* default_valences(const std::string& s) {
  static const std::map<std::string, std::vector<int>> v = {
      {"B", {3}}, {"C", {4}}, {"N", {3, 5}}, {"O", {2}}, {"P", {3, 5}},
      {"S", {2, 4, 6}}, {"F", {1}}, {"Cl", {1}}, {"Br", {1}}, {"I", {1}}};
  auto it = v.find(s);
  return it == v.end() ? nullptr : &it->second;
}

void assign_implicit_h(Mol& mol) {
  for (size_t i = 0; i < mol.atoms.size(); ++i) {
    Atom& a = mol.atoms[i];
    if (a.explicit_h >= 0) { a.implicit_h = a.explicit_h; continue; }
    if (!is_organic_subset(a.symbol) || a.charge != 0) { a.implicit_h = 0; continue; }
    int order_sum = 0;
    for (int b : mol.adj[i])
      order_sum += mol.bonds[b].aromatic ? 1 : mol.bonds[b].order;
    if (a.aromatic && (a.symbol == "B" || a.symbol == "C" ||
                       a.symbol == "N" || a.symbol == "P"))
      order_sum += 1;
    int h = 0;
    const auto* vals = default_valences(a.symbol);
    if (vals)
      for (int v : *vals)
        if (order_sum <= v) { h = v - order_sum; break; }
    a.implicit_h = h;
  }
}

struct ParseError {};

Atom parse_bracket(const std::string& body) {
  Atom atom;
  size_t i = 0;
  while (i < body.size() && isdigit((unsigned char)body[i]))
    atom.isotope = atom.isotope * 10 + (body[i++] - '0');
  if (i >= body.size()) throw ParseError{};
  std::string sym;
  if (body[i] == '*') { sym = "*"; ++i; }
  else if (isupper((unsigned char)body[i])) {
    sym += body[i++];
    // greedy two-letter element match (mirrors the python regex
    // [A-Z][a-z]? semantics: any trailing lowercase char joins the symbol)
    if (i < body.size() && islower((unsigned char)body[i])) {
      sym += body[i++];
    }
  } else if (islower((unsigned char)body[i])) {
    // aromatic lowercase symbol, possibly two letters (se, as, te)
    atom.aromatic = true;
    sym += (char)toupper((unsigned char)body[i++]);
    if (i < body.size() && islower((unsigned char)body[i]) && body[i] != 'h') {
      std::string cap = sym + std::string(1, body[i]);
      if (atomic_num(cap) > 0) { sym = cap; ++i; }
    }
  } else {
    throw ParseError{};
  }
  if (sym != "*" && atomic_num(sym) == 0) throw ParseError{};
  atom.symbol = sym;
  // chirality (ignored for fingerprints)
  while (i < body.size() && body[i] == '@') ++i;
  if (i < body.size() && (body.compare(i, 2, "TH") == 0 || body.compare(i, 2, "AL") == 0 ||
                          body.compare(i, 2, "SP") == 0 || body.compare(i, 2, "TB") == 0 ||
                          body.compare(i, 2, "OH") == 0)) {
    i += 2;
    while (i < body.size() && isdigit((unsigned char)body[i])) ++i;
  }
  atom.explicit_h = 0;
  if (i < body.size() && body[i] == 'H') {
    ++i;
    atom.explicit_h = 1;
    if (i < body.size() && isdigit((unsigned char)body[i])) {
      atom.explicit_h = 0;
      while (i < body.size() && isdigit((unsigned char)body[i]))
        atom.explicit_h = atom.explicit_h * 10 + (body[i++] - '0');
    }
  }
  if (i < body.size() && (body[i] == '+' || body[i] == '-')) {
    char sign = body[i];
    int count = 0;
    while (i < body.size() && body[i] == sign) { ++count; ++i; }
    if (i < body.size() && isdigit((unsigned char)body[i])) {
      count = 0;
      while (i < body.size() && isdigit((unsigned char)body[i]))
        count = count * 10 + (body[i++] - '0');
    }
    atom.charge = sign == '+' ? count : -count;
  }
  if (i < body.size() && body[i] == ':') {
    ++i;  // atom map, ignored
    while (i < body.size() && isdigit((unsigned char)body[i])) ++i;
  }
  if (i != body.size()) throw ParseError{};
  return atom;
}

Mol parse_smiles(const std::string& smiles) {
  Mol mol;
  int prev = -1;
  char pending = 0;
  std::vector<std::pair<int, char>> stack;
  std::map<int, std::pair<int, char>> ring_open;

  auto bond_props = [&](char ch, int a1, int a2, int* order, bool* aromatic) {
    if (ch == 0) {
      *order = SINGLE;
      *aromatic = mol.atoms[a1].aromatic && mol.atoms[a2].aromatic;
      return;
    }
    *aromatic = ch == ':';
    switch (ch) {
      case '=': *order = DOUBLE; break;
      case '#': *order = TRIPLE; break;
      case '$': *order = QUAD; break;
      default: *order = SINGLE; break;
    }
  };

  auto add_atom = [&](Atom a) {
    int cur = mol.add_atom(std::move(a));
    if (prev >= 0) {
      int order; bool arom;
      bond_props(pending, prev, cur, &order, &arom);
      mol.add_bond(prev, cur, order, arom);
    }
    pending = 0;
    prev = cur;
  };

  auto ring = [&](int num) {
    if (prev < 0) throw ParseError{};
    auto it = ring_open.find(num);
    if (it != ring_open.end()) {
      int other = it->second.first;
      char ch = pending ? pending : it->second.second;
      ring_open.erase(it);
      int order; bool arom;
      bond_props(ch, other, prev, &order, &arom);
      mol.add_bond(other, prev, order, arom);
    } else {
      ring_open[num] = {prev, pending};
    }
    pending = 0;
  };

  size_t i = 0, n = smiles.size();
  while (i < n) {
    char c = smiles[i];
    if (c == '[') {
      size_t j = smiles.find(']', i);
      if (j == std::string::npos) throw ParseError{};
      add_atom(parse_bracket(smiles.substr(i + 1, j - i - 1)));
      i = j + 1;
    } else if (c == 'C' && i + 1 < n && smiles[i + 1] == 'l') {
      add_atom({.symbol = "Cl"}); i += 2;
    } else if (c == 'B' && i + 1 < n && smiles[i + 1] == 'r') {
      add_atom({.symbol = "Br"}); i += 2;
    } else if (strchr("BCNOPSFI", c)) {
      add_atom({.symbol = std::string(1, c)}); ++i;
    } else if (strchr("bcnops", c)) {
      Atom a; a.symbol = std::string(1, (char)toupper(c)); a.aromatic = true;
      add_atom(std::move(a)); ++i;
    } else if (c == '*') {
      add_atom({.symbol = "*"}); ++i;
    } else if (strchr("-=#$:/\\~", c)) {
      pending = (c == '/' || c == '\\' || c == '~') ? '-' : c; ++i;
    } else if (c == '(') {
      stack.push_back({prev, pending}); pending = 0; ++i;
    } else if (c == ')') {
      if (stack.empty()) throw ParseError{};
      prev = stack.back().first; pending = stack.back().second;
      stack.pop_back(); ++i;
    } else if (isdigit((unsigned char)c)) {
      ring(c - '0'); ++i;
    } else if (c == '%') {
      if (i + 2 >= n || !isdigit((unsigned char)smiles[i + 1]) ||
          !isdigit((unsigned char)smiles[i + 2])) throw ParseError{};
      ring((smiles[i + 1] - '0') * 10 + (smiles[i + 2] - '0'));
      i += 3;
    } else if (c == '.') {
      prev = -1; pending = 0; ++i;
    } else if (c == ' ' || c == '\t') {
      break;
    } else {
      throw ParseError{};
    }
  }
  if (!ring_open.empty() || !stack.empty()) throw ParseError{};
  assign_implicit_h(mol);
  return mol;
}

std::vector<bool> ring_membership(const Mol& mol) {
  size_t n = mol.atoms.size();
  std::vector<int> deg(n);
  std::vector<bool> removed(n, false);
  std::vector<int> stack;
  for (size_t i = 0; i < n; ++i) {
    deg[i] = (int)mol.adj[i].size();
    if (deg[i] <= 1) stack.push_back((int)i);
  }
  while (!stack.empty()) {
    int a = stack.back(); stack.pop_back();
    if (removed[a]) continue;
    removed[a] = true;
    for (int b : mol.adj[a]) {
      int o = mol.other(b, a);
      if (!removed[o] && --deg[o] <= 1) stack.push_back(o);
    }
  }
  std::vector<bool> in_ring(n);
  for (size_t i = 0; i < n; ++i)
    in_ring[i] = !removed[i] && !mol.adj[i].empty();
  return in_ring;
}

std::vector<uint32_t> morgan_identifiers(const Mol& mol, int radius) {
  auto in_ring = ring_membership(mol);
  size_t n = mol.atoms.size();
  std::vector<uint32_t> ids;
  std::vector<uint32_t> current(n);
  for (size_t a = 0; a < n; ++a) {
    const Atom& at = mol.atoms[a];
    current[a] = hash_ints({(uint32_t)atomic_num(at.symbol),
                            (uint32_t)mol.adj[a].size(),
                            (uint32_t)at.total_h(), (uint32_t)at.charge,
                            (uint32_t)(at.aromatic ? 1 : 0),
                            (uint32_t)(in_ring[a] ? 1 : 0),
                            (uint32_t)at.isotope});
  }
  ids.insert(ids.end(), current.begin(), current.end());
  for (int r = 1; r <= radius; ++r) {
    std::vector<uint32_t> nxt(n);
    for (size_t a = 0; a < n; ++a) {
      std::vector<std::pair<uint32_t, uint32_t>> env;
      for (int b : mol.adj[a]) {
        uint32_t bkey = mol.bonds[b].aromatic ? AROMATIC : mol.bonds[b].order;
        env.push_back({bkey, current[mol.other(b, (int)a)]});
      }
      std::sort(env.begin(), env.end());
      std::vector<uint32_t> flat = {(uint32_t)r, current[a]};
      for (auto& e : env) { flat.push_back(e.first); flat.push_back(e.second); }
      nxt[a] = hash_ints(flat);
    }
    ids.insert(ids.end(), nxt.begin(), nxt.end());
    current = std::move(nxt);
  }
  return ids;
}

int fingerprint_into(const std::string& smiles, int radius, int n_bits,
                     bool counts, int32_t* out) {
  try {
    Mol mol = parse_smiles(smiles);
    if (mol.atoms.empty()) return 1;
    for (uint32_t id : morgan_identifiers(mol, radius)) {
      int slot = (int)(id % (uint32_t)n_bits);
      if (counts) out[slot] += 1; else out[slot] = 1;
    }
    return 0;
  } catch (...) {
    return 1;
  }
}

}  // namespace

extern "C" {

// Binary/count Morgan fingerprint. Returns 0 on success; on parse failure
// writes methane's fingerprint (reference retrieve_faiss.py:42-43 fallback)
// and returns 1.
int cchem_morgan_fp(const char* smiles, int radius, int n_bits, int counts,
                    int32_t* out) {
  memset(out, 0, sizeof(int32_t) * (size_t)n_bits);
  if (fingerprint_into(smiles, radius, n_bits, counts, out) == 0) return 0;
  memset(out, 0, sizeof(int32_t) * (size_t)n_bits);
  fingerprint_into("C", radius, n_bits, counts, out);
  return 1;
}

// Reaction difference fingerprint: sum(product counts) - sum(reactant
// counts) over '>'-separated reaction SMILES. Returns 0 on success.
int cchem_reaction_fp(const char* rxn_smiles, int radius, int n_bits,
                      int32_t* out) {
  memset(out, 0, sizeof(int32_t) * (size_t)n_bits);
  std::string s(rxn_smiles);
  size_t first = s.find('>');
  if (first == std::string::npos) return 1;
  size_t last = s.rfind('>');
  std::string reactants = s.substr(0, first);
  std::string products = s.substr(last + 1);
  std::vector<int32_t> tmp(n_bits);
  auto accumulate = [&](const std::string& side, int sign) {
    size_t start = 0;
    while (start <= side.size()) {
      size_t dot = side.find('.', start);
      std::string frag = side.substr(
          start, dot == std::string::npos ? std::string::npos : dot - start);
      if (!frag.empty()) {
        std::fill(tmp.begin(), tmp.end(), 0);
        if (fingerprint_into(frag, radius, n_bits, true, tmp.data()) == 0)
          for (int i = 0; i < n_bits; ++i) out[i] += sign * tmp[i];
      }
      if (dot == std::string::npos) break;
      start = dot + 1;
    }
  };
  accumulate(products, +1);
  accumulate(reactants, -1);
  return 0;
}

// Batched binary Morgan fingerprints into an int8 matrix (rows x n_bits).
// smiles_blob: concatenated NUL-terminated strings.
void cchem_morgan_fp_batch(const char* smiles_blob, int n_rows, int radius,
                           int n_bits, int8_t* out) {
  const char* p = smiles_blob;
  std::vector<int32_t> buf(n_bits);
  for (int row = 0; row < n_rows; ++row) {
    std::fill(buf.begin(), buf.end(), 0);
    cchem_morgan_fp(p, radius, n_bits, 0, buf.data());
    int8_t* dst = out + (size_t)row * n_bits;
    for (int i = 0; i < n_bits; ++i) dst[i] = (int8_t)buf[i];
    p += strlen(p) + 1;
  }
}

}  // extern "C"
