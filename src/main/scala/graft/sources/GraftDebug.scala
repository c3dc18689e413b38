package graft.sources
object GraftDebug { var enabled = false }
