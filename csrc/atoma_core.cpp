// Native runtime core: paged-KV block manager + input-prep helpers.
//
// C++ counterpart of the Python core/ modules, mirroring the reference's
// native (Rust) block manager (ref: backends/vllm/src/block_manager.rs,
// block_allocator.rs): free-list allocation with refcounts, whole-prompt
// tables, per-decode append with copy-on-write, fork, host swap remapping,
// sliding-window block reuse. Exposed as a C ABI for ctypes.
//
// The Python BlockSpaceManager remains the reference implementation; this
// core removes the per-step Python overhead on the scheduler hot path
// (SURVEY.md §7 design mapping: "scheduler/block-manager as a self-contained
// pure state machine so it can live in C++ behind a narrow API").

#include <cstdint>
#include <deque>
#include <cstring>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

enum Status : int { OK = 0, LATER = 1, NEVER = 2, NOTHING = 3 };

struct Block {
  int number;     // physical block id within its pool
  int ref_count;
  bool on_device;
};

struct Manager {
  int block_size;
  int num_device_blocks;
  int num_host_blocks;
  int watermark_blocks;
  int block_sliding_window;  // -1 = disabled

  std::vector<Block> blocks;          // device pool then host pool
  // FIFO free lists (pop front / push back) matching the Python deque
  // allocator's recycling order exactly (block_allocator.py).
  std::deque<int> free_device;
  std::deque<int> free_host;
  std::unordered_map<int64_t, std::vector<int>> tables;  // seq_id -> handles

  Block& at(int h) { return blocks[h]; }

  int alloc_device() {
    if (free_device.empty()) return -1;
    int h = free_device.front();
    free_device.pop_front();
    blocks[h].ref_count = 1;
    return h;
  }
  int alloc_host() {
    if (free_host.empty()) return -1;
    int h = free_host.front();
    free_host.pop_front();
    blocks[h].ref_count = 1;
    return h;
  }
  // Returns false on double free.
  bool free_block(int h) {
    Block& b = blocks[h];
    if (b.ref_count <= 0) return false;
    if (--b.ref_count == 0) {
      (b.on_device ? free_device : free_host).push_back(h);
    }
    return true;
  }
};

}  // namespace

extern "C" {

void* abm_create(int block_size, int num_device_blocks, int num_host_blocks,
                 double watermark, int sliding_window) {
  auto* m = new Manager();
  m->block_size = block_size;
  m->num_device_blocks = num_device_blocks;
  m->num_host_blocks = num_host_blocks;
  m->watermark_blocks = static_cast<int>(watermark * num_device_blocks);
  m->block_sliding_window =
      sliding_window > 0 ? sliding_window / block_size : -1;
  m->blocks.reserve(num_device_blocks + num_host_blocks);
  for (int i = 0; i < num_device_blocks; ++i)
    m->blocks.push_back({i, 0, true});
  for (int i = 0; i < num_host_blocks; ++i)
    m->blocks.push_back({i, 0, false});
  for (int i = 0; i < num_device_blocks; ++i) m->free_device.push_back(i);
  for (int i = 0; i < num_host_blocks; ++i)
    m->free_host.push_back(num_device_blocks + i);
  return m;
}

void abm_destroy(void* p) { delete static_cast<Manager*>(p); }

static int required_blocks(Manager* m, int num_logical) {
  if (m->block_sliding_window > 0 && num_logical > m->block_sliding_window)
    return m->block_sliding_window;
  return num_logical;
}

int abm_can_allocate(void* p, int num_logical_blocks) {
  auto* m = static_cast<Manager*>(p);
  int need = required_blocks(m, num_logical_blocks);
  if (m->num_device_blocks - need < m->watermark_blocks) return NEVER;
  if (static_cast<int>(m->free_device.size()) - need >= m->watermark_blocks)
    return OK;
  return LATER;
}

// Allocate one shared table for `num_seqs` waiting sequences.
// Returns 0 on success, -1 on pool exhaustion.
int abm_allocate(void* p, const int64_t* seq_ids, int num_seqs,
                 int num_logical_blocks) {
  auto* m = static_cast<Manager*>(p);
  int need = required_blocks(m, num_logical_blocks);
  std::vector<int> table;
  table.reserve(need);
  for (int i = 0; i < need; ++i) {
    int h = m->alloc_device();
    if (h < 0) return -1;
    m->at(h).ref_count = num_seqs;
    table.push_back(h);
  }
  for (int s = 0; s < num_seqs; ++s) m->tables[seq_ids[s]] = table;
  return 0;
}

int abm_can_append_slots(void* p, int num_running_seqs, int lookahead) {
  auto* m = static_cast<Manager*>(p);
  return num_running_seqs * (1 + lookahead) <=
         static_cast<int>(m->free_device.size());
}

// Ensure a slot exists for the next token. Returns: 0 = no-op/new block,
// 1 = CoW happened (cow_pair filled with src,dst block numbers), -1 = error.
int abm_append_slot(void* p, int64_t seq_id, int num_logical_blocks,
                    int* cow_pair) {
  auto* m = static_cast<Manager*>(p);
  auto it = m->tables.find(seq_id);
  if (it == m->tables.end()) return -1;
  auto& table = it->second;
  int len = static_cast<int>(table.size());

  if (len < num_logical_blocks) {
    if (m->block_sliding_window > 0 && len >= m->block_sliding_window) {
      table.push_back(table[len % m->block_sliding_window]);
    } else {
      int h = m->alloc_device();
      if (h < 0) return -1;
      table.push_back(h);
    }
    return 0;
  }
  int last = table.back();
  if (m->at(last).ref_count == 1) return 0;
  int fresh = m->alloc_device();
  if (fresh < 0) return -1;
  table.back() = fresh;
  m->free_block(last);
  cow_pair[0] = m->at(last).number;
  cow_pair[1] = m->at(fresh).number;
  return 1;
}

int abm_fork(void* p, int64_t parent, int64_t child) {
  auto* m = static_cast<Manager*>(p);
  auto it = m->tables.find(parent);
  if (it == m->tables.end()) return -1;
  std::vector<int> table = it->second;
  std::unordered_set<int> seen;
  for (int h : table)
    if (seen.insert(h).second) m->at(h).ref_count++;
  m->tables[child] = std::move(table);
  return 0;
}

int abm_can_swap_in(void* p, const int64_t* seq_ids, int n, int lookahead) {
  auto* m = static_cast<Manager*>(p);
  std::unordered_set<int> seen;
  int needed = 0;
  for (int i = 0; i < n; ++i) {
    auto it = m->tables.find(seq_ids[i]);
    if (it == m->tables.end()) continue;
    for (int h : it->second)
      if (seen.insert(h).second) needed++;
  }
  if (needed == 0) return NOTHING;
  int required = needed + n * (1 + lookahead);
  if (required > m->num_device_blocks) return NEVER;
  if (static_cast<int>(m->free_device.size()) - required >=
      m->watermark_blocks)
    return OK;
  return LATER;
}

// Remap host->device. pairs_out receives (host_num, dev_num)*; returns count
// of pairs, or -1 on exhaustion.
int abm_swap_in(void* p, const int64_t* seq_ids, int n, int* pairs_out) {
  auto* m = static_cast<Manager*>(p);
  std::unordered_map<int, int> mapping;  // host handle -> device handle
  int npairs = 0;
  for (int i = 0; i < n; ++i) {
    auto it = m->tables.find(seq_ids[i]);
    if (it == m->tables.end()) continue;
    for (int& h : it->second) {
      auto f = mapping.find(h);
      int dev;
      if (f == mapping.end()) {
        dev = m->alloc_device();
        if (dev < 0) return -1;
        mapping.emplace(h, dev);
        pairs_out[2 * npairs] = m->at(h).number;
        pairs_out[2 * npairs + 1] = m->at(dev).number;
        npairs++;
      } else {
        dev = f->second;
        m->at(dev).ref_count++;
      }
      m->free_block(h);
      h = dev;
    }
  }
  return npairs;
}

int abm_can_swap_out(void* p, const int64_t* seq_ids, int n) {
  auto* m = static_cast<Manager*>(p);
  std::unordered_set<int> seen;
  int needed = 0;
  for (int i = 0; i < n; ++i) {
    auto it = m->tables.find(seq_ids[i]);
    if (it == m->tables.end()) continue;
    for (int h : it->second)
      if (seen.insert(h).second) needed++;
  }
  return needed <= static_cast<int>(m->free_host.size());
}

int abm_swap_out(void* p, const int64_t* seq_ids, int n, int* pairs_out) {
  auto* m = static_cast<Manager*>(p);
  std::unordered_map<int, int> mapping;  // device handle -> host handle
  int npairs = 0;
  for (int i = 0; i < n; ++i) {
    auto it = m->tables.find(seq_ids[i]);
    if (it == m->tables.end()) continue;
    for (int& h : it->second) {
      auto f = mapping.find(h);
      int host;
      if (f == mapping.end()) {
        host = m->alloc_host();
        if (host < 0) return -1;
        mapping.emplace(h, host);
        pairs_out[2 * npairs] = m->at(h).number;
        pairs_out[2 * npairs + 1] = m->at(host).number;
        npairs++;
      } else {
        host = f->second;
        m->at(host).ref_count++;
      }
      m->free_block(h);
      h = host;
    }
  }
  return npairs;
}

void abm_free_seq(void* p, int64_t seq_id) {
  auto* m = static_cast<Manager*>(p);
  auto it = m->tables.find(seq_id);
  if (it == m->tables.end()) return;
  std::unordered_set<int> seen;
  for (int h : it->second)
    if (seen.insert(h).second) m->free_block(h);
  m->tables.erase(it);
}

void abm_reset(void* p) {
  auto* m = static_cast<Manager*>(p);
  for (auto& [seq, table] : m->tables) {
    std::unordered_set<int> seen;
    for (int h : table)
      if (seen.insert(h).second) m->free_block(h);
  }
  m->tables.clear();
}

int abm_has_table(void* p, int64_t seq_id) {
  auto* m = static_cast<Manager*>(p);
  return m->tables.count(seq_id) ? 1 : 0;
}

int abm_get_table(void* p, int64_t seq_id, int* out, int cap) {
  auto* m = static_cast<Manager*>(p);
  auto it = m->tables.find(seq_id);
  if (it == m->tables.end()) return -1;
  int n = static_cast<int>(it->second.size());
  if (n > cap) return -n;
  for (int i = 0; i < n; ++i) out[i] = m->at(it->second[i]).number;
  return n;
}

int abm_num_free_device(void* p) {
  return static_cast<int>(static_cast<Manager*>(p)->free_device.size());
}

int abm_num_free_host(void* p) {
  return static_cast<int>(static_cast<Manager*>(p)->free_host.size());
}

// ---------------------------------------------------------------- input prep
// Fill slot_mapping[start..end) for one sequence from its block table
// (ref: worker.rs:373-401 slot computation), replacing the per-token Python
// loop in engine/input_prep.py.
void fill_slot_mapping(const int* table, int table_len, int block_size,
                       int start_pos, int end_pos, int32_t* out) {
  // Matches the Python mapping: table[(pos // block_size) % len(table)] —
  // the modulo implements sliding-window block reuse (tables are capped at
  // window blocks in that mode).
  int mod = table_len > 0 ? table_len : 1;
  for (int pos = start_pos; pos < end_pos; ++pos) {
    int logical = (pos / block_size) % mod;
    int page = table_len > 0 ? table[logical] : 0;
    out[pos - start_pos] = page * block_size + (pos % block_size);
  }
}

}  // extern "C"
