// coslam native transport — UDP-multicast message bus.
//
// The TPU-native replacement for the reference's LCM dependency
// (reference: ORB_SLAM2.1/CMakeLists.txt:68 target_link_libraries(Mono lcm);
// publish at ORB_SLAM2.1/.../ros_mono.cc:2399, subscribe at
// ORB_SLAM2/.../ros_mono.cc:602).  Same semantics: named channels over UDP
// multicast, best-effort delivery, no ordering guarantee — the receiving
// agent sorts/dedups at the protocol layer (models/cooperative.py), exactly
// as the reference sorts received keyframe ids (ros_mono.cc:620-630).
//
// Messages larger than one datagram are fragmented with a small header and
// reassembled on the receiver; incomplete messages age out.  A background
// thread drains the socket into a bounded queue.
//
// C ABI for ctypes binding (coslam_tpu/native/__init__.py).  Build:
//   g++ -O2 -shared -fPIC -std=c++17 -pthread transport.cpp -o libcoslam_transport.so

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x434f534c;  // "COSL"
constexpr size_t kMaxDatagram = 60000;   // payload per fragment
constexpr size_t kMaxQueue = 256;        // buffered whole messages

#pragma pack(push, 1)
struct FragHeader {
  uint32_t magic;
  uint32_t msg_id;
  uint32_t channel_len;
  uint32_t frag_idx;
  uint32_t n_frags;
  uint64_t total_len;
};
#pragma pack(pop)

struct Message {
  std::string channel;
  std::vector<uint8_t> data;
};

struct Reassembly {
  std::vector<uint8_t> data;
  std::vector<bool> have;
  size_t received = 0;
  uint64_t created_tick = 0;
};

struct Bus {
  int sock = -1;
  sockaddr_in group_addr{};
  std::thread rx_thread;
  std::atomic<bool> stop{false};
  std::atomic<uint32_t> next_msg_id{1};

  std::mutex mu;
  std::condition_variable cv;
  std::deque<Message> queue;
  std::map<std::pair<uint32_t, uint32_t>, Reassembly> partial;  // (src-id, msg)
  uint64_t tick = 0;

  ~Bus() {
    stop = true;
    if (sock >= 0) ::shutdown(sock, SHUT_RDWR);
    if (rx_thread.joinable()) rx_thread.join();
    if (sock >= 0) ::close(sock);
  }
};

void rx_loop(Bus* bus) {
  std::vector<uint8_t> buf(kMaxDatagram + sizeof(FragHeader) + 512);
  while (!bus->stop.load()) {
    sockaddr_in src{};
    socklen_t slen = sizeof(src);
    ssize_t n = ::recvfrom(bus->sock, buf.data(), buf.size(), 0,
                           reinterpret_cast<sockaddr*>(&src), &slen);
    if (n <= 0) {
      if (bus->stop.load()) return;
      continue;
    }
    if (static_cast<size_t>(n) < sizeof(FragHeader)) continue;
    FragHeader h;
    std::memcpy(&h, buf.data(), sizeof(h));
    if (h.magic != kMagic) continue;
    size_t off = sizeof(FragHeader);
    if (off + h.channel_len > static_cast<size_t>(n)) continue;
    std::string channel(reinterpret_cast<char*>(buf.data() + off),
                        h.channel_len);
    off += h.channel_len;
    size_t payload = static_cast<size_t>(n) - off;

    std::lock_guard<std::mutex> lock(bus->mu);
    bus->tick++;
    auto key = std::make_pair(src.sin_port ^ src.sin_addr.s_addr, h.msg_id);
    auto& re = bus->partial[key];
    if (re.data.empty()) {
      re.data.resize(h.total_len);
      re.have.assign(h.n_frags, false);
      re.created_tick = bus->tick;
    }
    size_t frag_off = static_cast<size_t>(h.frag_idx) * kMaxDatagram;
    if (h.frag_idx < re.have.size() && !re.have[h.frag_idx] &&
        frag_off + payload <= re.data.size()) {
      std::memcpy(re.data.data() + frag_off, buf.data() + off, payload);
      re.have[h.frag_idx] = true;
      re.received++;
    }
    if (re.received == re.have.size()) {
      if (bus->queue.size() < kMaxQueue) {
        bus->queue.push_back({std::move(channel), std::move(re.data)});
        bus->cv.notify_one();
      }
      bus->partial.erase(key);
    }
    // age out stale partials (~4096 datagrams)
    for (auto it = bus->partial.begin(); it != bus->partial.end();) {
      if (bus->tick - it->second.created_tick > 4096)
        it = bus->partial.erase(it);
      else
        ++it;
    }
  }
}

}  // namespace

extern "C" {

void* ct_create(const char* group_ip, int port, int ttl) {
  auto* bus = new Bus();
  bus->sock = ::socket(AF_INET, SOCK_DGRAM, 0);
  if (bus->sock < 0) {
    delete bus;
    return nullptr;
  }
  int reuse = 1;
  ::setsockopt(bus->sock, SOL_SOCKET, SO_REUSEADDR, &reuse, sizeof(reuse));
  int rcvbuf = 8 * 1024 * 1024;
  ::setsockopt(bus->sock, SOL_SOCKET, SO_RCVBUF, &rcvbuf, sizeof(rcvbuf));

  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (::bind(bus->sock, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    delete bus;
    return nullptr;
  }

  ip_mreq mreq{};
  mreq.imr_multiaddr.s_addr = ::inet_addr(group_ip);
  mreq.imr_interface.s_addr = htonl(INADDR_ANY);
  ::setsockopt(bus->sock, IPPROTO_IP, IP_ADD_MEMBERSHIP, &mreq, sizeof(mreq));
  unsigned char loop = 1;
  ::setsockopt(bus->sock, IPPROTO_IP, IP_MULTICAST_LOOP, &loop, sizeof(loop));
  unsigned char ttl_c = static_cast<unsigned char>(ttl);
  ::setsockopt(bus->sock, IPPROTO_IP, IP_MULTICAST_TTL, &ttl_c, sizeof(ttl_c));

  bus->group_addr.sin_family = AF_INET;
  bus->group_addr.sin_addr.s_addr = ::inet_addr(group_ip);
  bus->group_addr.sin_port = htons(static_cast<uint16_t>(port));

  bus->rx_thread = std::thread(rx_loop, bus);
  return bus;
}

int ct_publish(void* handle, const char* channel, const uint8_t* data,
               uint64_t len) {
  auto* bus = static_cast<Bus*>(handle);
  uint32_t msg_id = bus->next_msg_id.fetch_add(1);
  uint32_t channel_len = static_cast<uint32_t>(std::strlen(channel));
  uint32_t n_frags =
      static_cast<uint32_t>((len + kMaxDatagram - 1) / kMaxDatagram);
  if (n_frags == 0) n_frags = 1;
  std::vector<uint8_t> pkt;
  for (uint32_t f = 0; f < n_frags; ++f) {
    size_t off = static_cast<size_t>(f) * kMaxDatagram;
    size_t chunk = std::min(kMaxDatagram, static_cast<size_t>(len) - off);
    FragHeader h{kMagic, msg_id, channel_len, f, n_frags, len};
    pkt.resize(sizeof(h) + channel_len + chunk);
    std::memcpy(pkt.data(), &h, sizeof(h));
    std::memcpy(pkt.data() + sizeof(h), channel, channel_len);
    if (chunk) std::memcpy(pkt.data() + sizeof(h) + channel_len,
                           data + off, chunk);
    ssize_t sent = ::sendto(
        bus->sock, pkt.data(), pkt.size(), 0,
        reinterpret_cast<sockaddr*>(&bus->group_addr),
        sizeof(bus->group_addr));
    if (sent < 0) return -1;
  }
  return 0;
}

// Returns payload length, 0 on timeout, -1 on buffer-too-small (length is
// still written to *needed), -2 on error.
int64_t ct_receive(void* handle, char* channel_out, uint64_t channel_cap,
                   uint8_t* buf, uint64_t buf_cap, int timeout_ms,
                   uint64_t* needed) {
  auto* bus = static_cast<Bus*>(handle);
  std::unique_lock<std::mutex> lock(bus->mu);
  if (bus->queue.empty()) {
    bus->cv.wait_for(lock, std::chrono::milliseconds(timeout_ms),
                     [bus] { return !bus->queue.empty() || bus->stop.load(); });
  }
  if (bus->queue.empty()) return 0;
  Message& m = bus->queue.front();
  if (needed) *needed = m.data.size();
  if (m.data.size() > buf_cap) return -1;
  std::snprintf(channel_out, channel_cap, "%s", m.channel.c_str());
  std::memcpy(buf, m.data.data(), m.data.size());
  int64_t n = static_cast<int64_t>(m.data.size());
  bus->queue.pop_front();
  return n;
}

void ct_destroy(void* handle) { delete static_cast<Bus*>(handle); }

}  // extern "C"
