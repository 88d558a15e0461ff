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

#include <algorithm>
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
  // Prefix caching (content-hashed blocks, block_allocator.py
  // CachedBlockAllocator parity):
  bool computed = false;
  bool has_hash = false;
  int64_t hash = 0;
  int num_hashed_tokens = 0;
  double last_accessed = 0.0;
  uint64_t evict_seqno = 0;  // insertion order in the evictor (scan order)
};

struct Manager {
  int block_size;
  int num_device_blocks;
  int num_host_blocks;
  int watermark_blocks;
  int block_sliding_window;  // -1 = disabled
  bool prefix_caching = false;

  std::vector<Block> blocks;          // device pool then host pool
  // FIFO free lists (pop front / push back) matching the Python deque
  // allocator's recycling order exactly (block_allocator.py).
  std::deque<int> free_device;
  std::deque<int> free_host;
  std::unordered_map<int64_t, std::vector<int>> tables;  // seq_id -> handles

  // Prefix-caching state (device pool only): hash -> handle for in-use
  // cached blocks, and the LRU evictor table over refcount-0 hashed blocks
  // (evictor.py LRUEvictor: least last_accessed, max num_hashed_tokens
  // tiebreak, insertion-order scan — replicated exactly so equivalence
  // tests can compare block-for-block).
  std::unordered_map<int64_t, int> cached;
  std::unordered_map<int64_t, int> evictable;
  uint64_t evict_counter = 0;

  Block& at(int h) { return blocks[h]; }

  int num_free_device() const {
    return static_cast<int>(free_device.size() + evictable.size());
  }

  // Evict the LRU victim (evictor.py evict): strictly-older last_accessed
  // wins; equal-time ties prefer MORE hashed tokens; scan follows
  // insertion order so equal (time, tokens) picks the earliest inserted.
  int evict_victim() {
    if (evictable.empty()) return -1;
    // Collect and sort by insertion seqno to reproduce dict-order scan.
    std::vector<int> order;
    order.reserve(evictable.size());
    for (auto& [hash, h] : evictable) order.push_back(h);
    std::sort(order.begin(), order.end(), [this](int a, int b) {
      return blocks[a].evict_seqno < blocks[b].evict_seqno;
    });
    int victim = order[0];
    for (size_t i = 1; i < order.size(); ++i) {
      Block& b = blocks[order[i]];
      Block& v = blocks[victim];
      if (b.last_accessed < v.last_accessed) {
        victim = order[i];
      } else if (b.last_accessed == v.last_accessed &&
                 b.num_hashed_tokens > v.num_hashed_tokens) {
        victim = order[i];
      }
    }
    evictable.erase(blocks[victim].hash);
    blocks[victim].computed = false;
    return victim;
  }

  // Fresh device block: free list first, then evictor
  // (block_allocator.py _allocate_fresh).
  int alloc_device() {
    int h;
    if (!free_device.empty()) {
      h = free_device.front();
      free_device.pop_front();
    } else if (prefix_caching && !evictable.empty()) {
      h = evict_victim();
      if (blocks[h].has_hash) cached.erase(blocks[h].hash);
    } else {
      return -1;
    }
    Block& b = blocks[h];
    b.ref_count = 1;
    b.computed = false;
    b.has_hash = false;
    b.num_hashed_tokens = 0;
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
      if (b.on_device && prefix_caching && b.has_hash) {
        // Keep content-addressable until evicted
        // (block_allocator.py CachedBlockAllocator.free).
        b.evict_seqno = evict_counter++;
        evictable[b.hash] = h;
        cached.erase(b.hash);
      } else {
        (b.on_device ? free_device : free_host).push_back(h);
      }
    }
    return true;
  }

  // Cached allocate by content hash (block_allocator.py allocate()).
  int alloc_device_hashed(int64_t hash, int num_hashed_tokens) {
    auto hit = cached.find(hash);
    if (hit != cached.end()) {  // in-use cache hit: share
      blocks[hit->second].ref_count++;
      return hit->second;
    }
    auto rev = evictable.find(hash);
    if (rev != evictable.end()) {  // refcount-0 hit: revive
      int h = rev->second;
      evictable.erase(rev);
      blocks[h].ref_count = 1;
      cached[hash] = h;
      return h;
    }
    int h = alloc_device();
    if (h < 0) return -1;
    Block& b = blocks[h];
    b.has_hash = true;
    b.hash = hash;
    b.num_hashed_tokens = num_hashed_tokens;
    cached[hash] = h;
    return h;
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
  if (m->num_free_device() - need >= m->watermark_blocks) return OK;
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
  return num_running_seqs * (1 + lookahead) <= m->num_free_device();
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

// 1 if the sequence's last physical block is shared (ref_count > 1), i.e.
// the next single-token append will copy-on-write and consume a free block.
// Used by the scheduler's decode fast-path block-demand precheck.
int abm_last_block_shared(void* p, int64_t seq_id) {
  auto* m = static_cast<Manager*>(p);
  auto it = m->tables.find(seq_id);
  if (it == m->tables.end() || it->second.empty()) return 0;
  return m->at(it->second.back()).ref_count > 1 ? 1 : 0;
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
  if (m->num_free_device() - required >= m->watermark_blocks) return OK;
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
  return static_cast<Manager*>(p)->num_free_device();
}

int abm_num_free_host(void* p) {
  return static_cast<int>(static_cast<Manager*>(p)->free_host.size());
}

// ------------------------------------------------------------ prefix caching
// (block_manager.py + block_allocator.py CachedBlockAllocator parity; the
// reference declares the evictor but never wires it — evictor.rs:6-136.)

void abm_enable_prefix_caching(void* p, int enable) {
  static_cast<Manager*>(p)->prefix_caching = enable != 0;
}

// Allocate one shared table with content hashes for the first num_hashable
// logical blocks. Returns the count of LEADING hashable blocks that were
// already computed (their tokens can skip prefill), or -1 on exhaustion.
int abm_allocate_cached(void* p, const int64_t* seq_ids, int num_seqs,
                        int num_logical_blocks, const int64_t* hashes,
                        int num_hashable) {
  auto* m = static_cast<Manager*>(p);
  if (!m->prefix_caching) return -2;  // caller must use abm_allocate
  int need = num_logical_blocks;
  std::vector<int> table;
  table.reserve(need);
  for (int i = 0; i < need; ++i) {
    int h = i < num_hashable
                ? m->alloc_device_hashed(hashes[i], (i + 1) * m->block_size)
                : m->alloc_device();
    if (h < 0) {
      for (int u : table) m->free_block(u);  // unwind partial allocation
      return -1;
    }
    m->at(h).ref_count += num_seqs - 1;
    table.push_back(h);
  }
  int computed = 0;
  for (int i = 0; i < num_hashable && i < need; ++i) {
    if (!m->at(table[i]).computed) break;
    computed++;
  }
  for (int s = 0; s < num_seqs; ++s) m->tables[seq_ids[s]] = table;
  return computed;
}

// Mark the first num_full blocks of a sequence computed
// (block_manager.py compute_full_blocks_in_sequence).
void abm_mark_computed(void* p, int64_t seq_id, int num_full) {
  auto* m = static_cast<Manager*>(p);
  auto it = m->tables.find(seq_id);
  if (it == m->tables.end()) return;
  int n = std::min(num_full, static_cast<int>(it->second.size()));
  for (int i = 0; i < n; ++i) m->at(it->second[i]).computed = true;
}

// Longest computed prefix's physical block numbers
// (block_manager.py get_all_computed_blocks). Returns count (≤ cap).
int abm_computed_prefix(void* p, int64_t seq_id, int* out, int cap) {
  auto* m = static_cast<Manager*>(p);
  auto it = m->tables.find(seq_id);
  if (it == m->tables.end()) return 0;
  int n = 0;
  for (int h : it->second) {
    if (!m->at(h).computed || n >= cap) break;
    out[n++] = m->at(h).number;
  }
  return n;
}

// Touch access times for LRU (block_manager.py access_all_blocks_in_sequence).
void abm_touch(void* p, int64_t seq_id, double now) {
  auto* m = static_cast<Manager*>(p);
  auto it = m->tables.find(seq_id);
  if (it == m->tables.end()) return;
  for (int h : it->second) m->at(h).last_accessed = now;
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
