// Cassandra .pomdp parser — native fast path for dtqn_tpu.
//
// Parses the same grammar subset as dtqn_tpu/envs/pomdp_parser.py (the
// Python reference implementation; see its docstring for the grammar) into
// dense row-major arrays:
//   T[S, A, S], O[A, S, Obs], R[S, A, S], start[S]
// exposed through a minimal C ABI consumed via ctypes:
//   pomdp_parse(text) -> handle
//   pomdp_dims(handle, int out[3])           // S, A, Obs
//   pomdp_fill(handle, T, O, R, start) -> discount
//   pomdp_free(handle)
//
// Build: make -C native   (produces libpomdp_parser.so)

#include <cctype>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Pomdp {
  int S = 0, A = 0, Obs = 0;
  double discount = 0.95;
  bool cost = false;
  std::vector<std::string> states, actions, observations;
  std::vector<double> T, O, R, start;
  bool start_set = false;

  double& t(int s, int a, int s2) { return T[(size_t)(s * A + a) * S + s2]; }
  double& o(int a, int s2, int ob) { return O[(size_t)(a * S + s2) * Obs + ob]; }
  double& r(int s, int a, int s2) { return R[(size_t)(s * A + a) * S + s2]; }
};

std::vector<std::string> split_ws(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    while (i < s.size() && std::isspace((unsigned char)s[i])) i++;
    size_t j = i;
    while (j < s.size() && !std::isspace((unsigned char)s[j])) j++;
    if (j > i) out.push_back(s.substr(i, j - i));
    i = j;
  }
  return out;
}

std::string strip(const std::string& s) {
  size_t b = 0, e = s.size();
  while (b < e && std::isspace((unsigned char)s[b])) b++;
  while (e > b && std::isspace((unsigned char)s[e - 1])) e--;
  return s.substr(b, e - b);
}

std::vector<std::string> name_list(const std::vector<std::string>& toks,
                                   const char* prefix) {
  if (toks.size() == 1 &&
      toks[0].find_first_not_of("0123456789") == std::string::npos) {
    int n = std::stoi(toks[0]);
    std::vector<std::string> out;
    out.reserve(n);
    for (int i = 0; i < n; i++) out.push_back(std::string(prefix) + std::to_string(i));
    return out;
  }
  return toks;
}

// Resolve a token against a name list: "*" -> all, digits -> index, else name.
std::vector<int> resolve(const std::vector<std::string>& names,
                         const std::string& tok) {
  std::vector<int> out;
  if (tok == "*") {
    out.resize(names.size());
    for (size_t i = 0; i < names.size(); i++) out[i] = (int)i;
    return out;
  }
  bool digits = !tok.empty() &&
                tok.find_first_not_of("0123456789") == std::string::npos;
  if (digits) {
    out.push_back(std::stoi(tok));
    return out;
  }
  for (size_t i = 0; i < names.size(); i++)
    if (names[i] == tok) {
      out.push_back((int)i);
      return out;
    }
  return out;  // unknown name: empty (line ignored)
}

std::vector<std::string> logical_lines(const std::string& text) {
  std::vector<std::string> lines;
  size_t pos = 0;
  while (pos <= text.size()) {
    size_t nl = text.find('\n', pos);
    std::string line = text.substr(
        pos, nl == std::string::npos ? std::string::npos : nl - pos);
    size_t hash = line.find('#');
    if (hash != std::string::npos) line = line.substr(0, hash);
    line = strip(line);
    if (!line.empty()) lines.push_back(line);
    if (nl == std::string::npos) break;
    pos = nl + 1;
  }
  return lines;
}

std::vector<std::string> split_colon(const std::string& s) {
  std::vector<std::string> out;
  size_t pos = 0;
  while (true) {
    size_t c = s.find(':', pos);
    if (c == std::string::npos) {
      out.push_back(strip(s.substr(pos)));
      break;
    }
    out.push_back(strip(s.substr(pos, c - pos)));
    pos = c + 1;
  }
  return out;
}

struct Parser {
  std::vector<std::string> lines;
  size_t i = 0;
  Pomdp p;

  void ensure_arrays() {
    if (!p.T.empty()) return;
    p.S = (int)p.states.size();
    p.A = (int)p.actions.size();
    p.Obs = (int)p.observations.size();
    p.T.assign((size_t)p.S * p.A * p.S, 0.0);
    p.O.assign((size_t)p.A * p.S * p.Obs, 0.0);
    p.R.assign((size_t)p.S * p.A * p.S, 0.0);
    p.start.assign(p.S, 0.0);
  }

  std::vector<double> float_row(const std::string& line) {
    std::vector<double> out;
    for (auto& t : split_ws(line)) out.push_back(std::stod(t));
    return out;
  }

  bool parse(const std::string& text) {
    lines = logical_lines(text);
    while (i < lines.size()) {
      const std::string line = lines[i++];
      size_t c = line.find(':');
      if (c == std::string::npos) continue;
      std::string key = strip(line.substr(0, c));
      std::string rest = strip(line.substr(c + 1));
      if (key == "discount") {
        p.discount = std::stod(rest);
      } else if (key == "values") {
        p.cost = rest == "cost";
      } else if (key == "states") {
        p.states = name_list(split_ws(rest), "s");
      } else if (key == "actions") {
        p.actions = name_list(split_ws(rest), "a");
      } else if (key == "observations") {
        p.observations = name_list(split_ws(rest), "o");
      } else if (key == "start") {
        ensure_arrays();
        if (rest.empty() && i < lines.size()) rest = lines[i++];
        if (rest == "uniform") {
          for (auto& v : p.start) v = 1.0 / p.S;
        } else {
          auto toks = split_ws(rest);
          bool numeric = true;
          for (auto& t : toks)
            if (t.find_first_not_of("0123456789.eE+-") != std::string::npos)
              numeric = false;
          if (numeric && (int)toks.size() == p.S) {
            for (int s = 0; s < p.S; s++) p.start[s] = std::stod(toks[s]);
          } else {
            double total = 0;
            for (auto& t : toks)
              for (int s : resolve(p.states, t)) {
                p.start[s] = 1.0;
                total += 1.0;
              }
            if (total > 0)
              for (auto& v : p.start) v /= total;
          }
        }
        p.start_set = true;
      } else if (key == "T") {
        ensure_arrays();
        if (!parse_T(rest)) return false;
      } else if (key == "O") {
        ensure_arrays();
        if (!parse_O(rest)) return false;
      } else if (key == "R") {
        ensure_arrays();
        if (!parse_R(rest)) return false;
      }
    }
    ensure_arrays();
    if (!p.start_set)
      for (auto& v : p.start) v = 1.0 / p.S;
    if (p.cost)
      for (auto& v : p.R) v = -v;
    return true;
  }

  bool parse_T(const std::string& rest) {
    auto parts = split_colon(rest);
    auto acts = resolve(p.actions, parts[0]);
    if (parts.size() == 3) {
      auto tail = split_ws(parts[2]);
      std::string tok = tail[0];
      double prob = tail.size() >= 2 ? std::stod(tail[1])
                                     : std::stod(lines[i++]);
      for (int a : acts)
        for (int s : resolve(p.states, parts[1]))
          for (int s2 : resolve(p.states, tok)) p.t(s, a, s2) = prob;
    } else if (parts.size() == 2) {
      auto row = float_row(lines[i++]);
      for (int a : acts)
        for (int s : resolve(p.states, parts[1]))
          for (int s2 = 0; s2 < p.S; s2++) p.t(s, a, s2) = row[s2];
    } else {
      std::string spec = lines[i++];
      if (spec == "identity") {
        for (int a : acts)
          for (int s = 0; s < p.S; s++) p.t(s, a, s) = 1.0;
      } else if (spec == "uniform") {
        for (int a : acts)
          for (int s = 0; s < p.S; s++)
            for (int s2 = 0; s2 < p.S; s2++) p.t(s, a, s2) = 1.0 / p.S;
      } else {
        std::vector<std::vector<double>> rows{float_row(spec)};
        for (int r = 1; r < p.S; r++) rows.push_back(float_row(lines[i++]));
        for (int a : acts)
          for (int s = 0; s < p.S; s++)
            for (int s2 = 0; s2 < p.S; s2++) p.t(s, a, s2) = rows[s][s2];
      }
    }
    return true;
  }

  bool parse_O(const std::string& rest) {
    auto parts = split_colon(rest);
    auto acts = resolve(p.actions, parts[0]);
    if (parts.size() == 3) {
      auto tail = split_ws(parts[2]);
      std::string tok = tail[0];
      double prob = tail.size() >= 2 ? std::stod(tail[1])
                                     : std::stod(lines[i++]);
      for (int a : acts)
        for (int s2 : resolve(p.states, parts[1]))
          for (int ob : resolve(p.observations, tok)) p.o(a, s2, ob) = prob;
    } else if (parts.size() == 2) {
      auto row = float_row(lines[i++]);
      for (int a : acts)
        for (int s2 : resolve(p.states, parts[1]))
          for (int ob = 0; ob < p.Obs; ob++) p.o(a, s2, ob) = row[ob];
    } else {
      std::string spec = lines[i++];
      if (spec == "uniform") {
        for (int a : acts)
          for (int s2 = 0; s2 < p.S; s2++)
            for (int ob = 0; ob < p.Obs; ob++) p.o(a, s2, ob) = 1.0 / p.Obs;
      } else {
        std::vector<std::vector<double>> rows{float_row(spec)};
        for (int r = 1; r < p.S; r++) rows.push_back(float_row(lines[i++]));
        for (int a : acts)
          for (int s2 = 0; s2 < p.S; s2++)
            for (int ob = 0; ob < p.Obs; ob++) p.o(a, s2, ob) = rows[s2][ob];
      }
    }
    return true;
  }

  bool parse_R(const std::string& rest) {
    // R: a : s : s' : o v — obs folded into expected reward (matches the
    // Python reference; classic files always use '*' for o).
    auto parts = split_colon(rest);
    if (parts.size() < 4) return true;  // unsupported form: skip
    auto acts = resolve(p.actions, parts[0]);
    auto tail = split_ws(parts[3]);
    double val = tail.size() >= 2 ? std::stod(tail[1]) : std::stod(lines[i++]);
    for (int a : acts)
      for (int s : resolve(p.states, parts[1]))
        for (int s2 : resolve(p.states, parts[2])) p.r(s, a, s2) = val;
    return true;
  }
};

}  // namespace

extern "C" {

void* pomdp_parse(const char* text) {
  Parser* parser = new Parser();
  if (!parser->parse(text ? text : "")) {
    delete parser;
    return nullptr;
  }
  return parser;
}

void pomdp_dims(void* handle, int* out) {
  Parser* parser = static_cast<Parser*>(handle);
  out[0] = parser->p.S;
  out[1] = parser->p.A;
  out[2] = parser->p.Obs;
}

double pomdp_fill(void* handle, float* T, float* O, float* R, float* start) {
  Parser* parser = static_cast<Parser*>(handle);
  const Pomdp& p = parser->p;
  for (size_t k = 0; k < p.T.size(); k++) T[k] = (float)p.T[k];
  for (size_t k = 0; k < p.O.size(); k++) O[k] = (float)p.O[k];
  for (size_t k = 0; k < p.R.size(); k++) R[k] = (float)p.R[k];
  for (size_t k = 0; k < p.start.size(); k++) start[k] = (float)p.start[k];
  return p.discount;
}

void pomdp_free(void* handle) { delete static_cast<Parser*>(handle); }

}  // extern "C"
