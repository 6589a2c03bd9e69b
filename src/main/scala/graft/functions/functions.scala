package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.bridge

/** Column-level entry points for the engine's native expressions. */
package object functions {

  /** rapidfuzz `fuzz.ratio`-compatible Indel similarity (0..100). */
  def indel_ratio(a: Column, b: Column): Column =
    bridge.column(IndelRatio(bridge.expression(a), bridge.expression(b)))
}
